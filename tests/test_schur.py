"""Distributed Schur-complement KKT tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uno_tpu.parallel.schur import (dense_from_blocks, make_sharded_schur_solver,
                                    random_block_arrow_system, schur_factor,
                                    schur_solve)
from uno_tpu.parallel import make_mesh


def test_schur_matches_dense():
    S, nb, n0 = 4, 12, 5
    Ks, Bs, K0 = random_block_arrow_system(S, nb, n0, seed=1)
    rng = np.random.default_rng(2)
    rhs_s = rng.standard_normal((S, nb))
    rhs0 = rng.standard_normal(n0)

    fac = schur_factor(jnp.asarray(Ks), jnp.asarray(Bs), jnp.asarray(K0))
    xs, x0 = schur_solve(fac, jnp.asarray(Bs), jnp.asarray(rhs_s), jnp.asarray(rhs0))

    K = dense_from_blocks(Ks, Bs, K0)
    x_dense = np.linalg.solve(K, np.concatenate([rhs_s.ravel(), rhs0]))
    assert np.allclose(np.asarray(xs).ravel(), x_dense[: S * nb], atol=1e-8)
    assert np.allclose(np.asarray(x0), x_dense[S * nb:], atol=1e-8)


def test_schur_inertia_haynsworth():
    S, nb, n0 = 3, 8, 4
    Ks, Bs, K0 = random_block_arrow_system(S, nb, n0, seed=3)
    fac = schur_factor(jnp.asarray(Ks), jnp.asarray(Bs), jnp.asarray(K0))
    K = dense_from_blocks(Ks, Bs, K0)
    w = np.linalg.eigvalsh(K)
    assert int(fac.num_pos) == int(np.sum(w > 0))
    assert int(fac.num_neg) == int(np.sum(w < 0))
    assert int(fac.num_zero) == 0


def test_schur_indefinite_saddle():
    # saddle-point-structured blocks: [H J^T; J 0] per scenario
    rng = np.random.default_rng(4)
    S, n, m, n0 = 2, 6, 3, 4
    nb = n + m
    Ks = []
    for s in range(S):
        Hb = rng.standard_normal((n, n))
        H = Hb @ Hb.T + n * np.eye(n)
        J = rng.standard_normal((m, n))
        Ks.append(np.block([[H, J.T], [J, np.zeros((m, m))]]))
    Ks = np.stack(Ks)
    Bs = np.zeros((S, nb, n0))
    Bs[:, :n, :] = rng.standard_normal((S, n, n0)) * 0.1
    K0 = np.eye(n0) * n0
    fac = schur_factor(jnp.asarray(Ks), jnp.asarray(Bs), jnp.asarray(K0))
    # expected inertia: S*(n, m) blocks + (n0, 0)
    assert int(fac.num_pos) == S * n + n0
    assert int(fac.num_neg) == S * m


def test_sharded_schur_over_mesh():
    assert jax.device_count() >= 8
    mesh = make_mesh(axis_name="scenario")
    S, nb, n0 = 8, 16, 6
    Ks, Bs, K0 = random_block_arrow_system(S, nb, n0, seed=5)
    rng = np.random.default_rng(6)
    rhs_s = rng.standard_normal((S, nb))
    rhs0 = rng.standard_normal(n0)

    solver = make_sharded_schur_solver(mesh, nb, n0)
    xs, x0, pos, neg, zero = jax.block_until_ready(solver(
        jnp.asarray(Ks), jnp.asarray(Bs), jnp.asarray(K0),
        jnp.asarray(rhs_s), jnp.asarray(rhs0)))

    K = dense_from_blocks(Ks, Bs, K0)
    x_dense = np.linalg.solve(K, np.concatenate([rhs_s.ravel(), rhs0]))
    assert np.allclose(np.asarray(xs).ravel(), x_dense[: S * nb], atol=1e-8)
    assert np.allclose(np.asarray(x0), x_dense[S * nb:], atol=1e-8)
    assert int(pos) + int(neg) == S * nb + n0 and int(zero) == 0


def test_sharded_multiple_scenarios_per_device():
    mesh = make_mesh(axis_name="scenario")
    S, nb, n0 = 16, 8, 4   # 2 scenarios per device
    Ks, Bs, K0 = random_block_arrow_system(S, nb, n0, seed=7)
    rhs_s = np.ones((S, nb))
    rhs0 = np.ones(n0)
    solver = make_sharded_schur_solver(mesh, nb, n0)
    xs, x0, *_ = jax.block_until_ready(solver(
        jnp.asarray(Ks), jnp.asarray(Bs), jnp.asarray(K0),
        jnp.asarray(rhs_s), jnp.asarray(rhs0)))
    K = dense_from_blocks(Ks, Bs, K0)
    x_dense = np.linalg.solve(K, np.concatenate([rhs_s.ravel(), rhs0]))
    assert np.allclose(np.asarray(xs).ravel(), x_dense[: S * nb], atol=1e-8)
