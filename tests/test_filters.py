"""Unit tests for the vectorized filter/funnel primitives
(reference Filter.cpp / NonmonotoneFilter.cpp / Funnel.cpp semantics)."""

import jax.numpy as jnp
import numpy as np

from uno_tpu.ingredients import filters as flt


def _mkfilter(entries, cap=6, ub=jnp.inf):
    f = flt.filter_init(cap)
    f = flt.filter_set_ub(f, ub)
    h = np.full(cap, np.inf)
    phi = np.full(cap, np.inf)
    for i, (hi, pi) in enumerate(entries):
        h[i] = hi
        phi[i] = pi
    return flt.FilterState(jnp.asarray(h), jnp.asarray(phi), f.ub)


def test_nm_count_dominated():
    # entries (h, phi): trial dominated by an entry when neither margin holds
    f = _mkfilter([(1.0, 10.0), (2.0, 5.0), (3.0, 1.0)])
    beta, gamma = 0.999, 0.001
    # trial clearly dominated by all three
    assert int(flt.nm_count_dominated(f, 4.0, 20.0, beta, gamma)) == 3
    # trial dominating all: zero
    assert int(flt.nm_count_dominated(f, 0.5, 0.5, beta, gamma)) == 0
    # phi=2 beats entries with phi=10 and phi=5; only (3.0, 1.0) dominates
    assert int(flt.nm_count_dominated(f, 4.0, 2.0, beta, gamma)) == 1


def test_nm_acceptable_tolerates_up_to_max_dom():
    f = _mkfilter([(1.0, 10.0), (2.0, 5.0), (3.0, 1.0)])
    beta, gamma = 0.999, 0.001
    # dominated by 3 > max_dom=2 -> reject; <= 3 -> accept
    assert not bool(flt.nm_filter_acceptable(f, 4.0, 20.0, beta, gamma, 2))
    assert bool(flt.nm_filter_acceptable(f, 4.0, 20.0, beta, gamma, 3))
    # monotone filter would reject this (dominated by one entry)
    assert bool(flt.nm_filter_acceptable(f, 2.5, 6.0, beta, gamma, 1))


def test_nm_add_keeps_insertion_order_and_evicts():
    f = _mkfilter([(3.0, 1.0), (1.0, 10.0)], cap=3)
    f2 = flt.nm_filter_add(f, 2.0, 5.0, 3)
    h = np.asarray(f2.h)
    assert list(h[:3]) == [3.0, 1.0, 2.0]  # appended, order kept
    # cap reached: adding another evicts entry index 1 (reference behavior)
    f3 = flt.nm_filter_add(f2, 0.5, 20.0, 3)
    h3 = np.asarray(f3.h)
    assert list(h3[:3]) == [3.0, 2.0, 0.5]


def test_nm_add_removes_entries_dominated_by_many():
    # entry (4, 4) dominated by (1,1), (2,2), (3,3) and the new point (0.5,0.5)
    f = _mkfilter([(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 4.0)], cap=6)
    f2 = flt.nm_filter_add(f, 0.5, 0.5, 3)
    h = np.asarray(f2.h)
    assert 4.0 not in h[np.isfinite(h)] or \
        np.sum(np.isfinite(h)) < 5  # (4,4) dropped: 4 dominators > 3


def test_nm_actual_reduction_nonmonotone_max():
    f = _mkfilter([(1.0, 10.0), (2.0, 20.0)])
    # monotone reduction would be merit_cur - merit_tri = 5 - 4 = 1;
    # nonmonotone compares against the max recent dash objective (>= 20)
    red = float(flt.nm_actual_objective_reduction(f, 5.0, 1.5, 4.0, 0.001, 2))
    assert red > 10.0


def test_funnel_width_update_strategies():
    w, h_cur, h_tri, margin, kappa = 10.0, 4.0, 2.0, 0.5, 0.5
    w1 = float(flt.funnel_update_width(w, h_cur, h_tri, margin, kappa, 1))
    assert w1 == max(margin * w, kappa * h_cur + (1 - kappa) * h_tri)
    w2 = float(flt.funnel_update_width(w, h_cur, h_tri, margin, kappa, 2))
    assert w2 == kappa * w + (1 - kappa) * h_tri
    w3 = float(flt.funnel_update_width(w, h_cur, h_tri, margin, kappa, 3))
    assert w3 == margin * w
    # strategy 1 with infeasibility increase: plain shrink
    w1b = float(flt.funnel_update_width(w, 1.0, 2.0, margin, kappa, 1))
    assert w1b == margin * w
