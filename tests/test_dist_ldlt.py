"""Mesh-distributed dense LDL^T tests (8 virtual CPU devices).

The general-matrix analogue of the reference's MPI-parallel MUMPS
(SURVEY.md §2.9): factorization, inertia, and solves must agree with the
single-chip blocked kernel regardless of the mesh size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from uno_tpu.linalg.ldlt import ldlt_factor_blocked
from uno_tpu.parallel.dist_ldlt import cyclic_permutation, make_dist_ldlt


def kkt_matrix(n, m, seed=0, reg=-1e-6):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((n - m, n - m))
    H = np.eye(n - m) * 2 + 0.1 * (B + B.T) / 2
    J = rng.standard_normal((m, n - m))
    return np.block([[H, J.T], [J, reg * np.eye(m)]])


def make(n, block, nproc):
    mesh = Mesh(np.array(jax.devices()[:nproc]).reshape(nproc), ("kkt",))
    return make_dist_ldlt(mesh, n, "kkt", block)


@pytest.mark.parametrize("nproc", [1, 2, 8])
def test_factor_matches_single_chip(nproc):
    n, block = 256, 32
    K = kkt_matrix(n, n // 4, seed=3)
    factor, _, perm = make(n, block, nproc)
    fac = factor(jnp.asarray(K[:, perm]))
    ref = ldlt_factor_blocked(jnp.asarray(K), block=block)
    assert (int(fac.num_pos), int(fac.num_neg), int(fac.num_zero)) == \
        (int(ref.num_pos), int(ref.num_neg), int(ref.num_zero))
    # backward error of the recomposed factorization
    Lc = np.asarray(fac.L_cyc)
    L = np.zeros_like(Lc)
    L[:, perm] = Lc
    L += np.eye(n)
    rec = L @ np.diag(np.asarray(fac.d)) @ L.T
    assert np.max(np.abs(rec - K)) / np.max(np.abs(K)) < 1e-7


def test_solve_matches_numpy():
    n, block, nproc = 256, 32, 8
    K = kkt_matrix(n, n // 4, seed=4)
    factor, solve, perm = make(n, block, nproc)
    fac = factor(jnp.asarray(K[:, perm]))
    rng = np.random.default_rng(5)
    for _ in range(3):
        rhs = rng.standard_normal(n)
        x = np.asarray(solve(fac, jnp.asarray(rhs)))
        x_ref = np.linalg.solve(K, rhs)
        assert np.max(np.abs(x - x_ref)) / np.max(np.abs(x_ref)) < 1e-7


def test_indefinite_inertia():
    """A saddle KKT matrix: inertia must be (n-m, m, 0) when H is SPD on the
    nullspace (here H itself SPD and the constraint block negative)."""
    n, m, block, nproc = 128, 32, 16, 8
    rng = np.random.default_rng(6)
    J = rng.standard_normal((m, n - m))
    K = np.block([[np.eye(n - m) * 3, J.T], [J, -0.5 * np.eye(m)]])
    factor, _, perm = make(n, block, nproc)
    fac = factor(jnp.asarray(K[:, perm]))
    assert int(fac.num_pos) == n - m
    assert int(fac.num_neg) == m
    assert int(fac.num_zero) == 0


def test_cyclic_permutation_roundtrip():
    perm = cyclic_permutation(64, 4, 8)
    assert sorted(perm.tolist()) == list(range(64))
    # device p's slice must hold panels {p, p+4, ...}
    nloc = 16
    for p in range(4):
        cols = perm[p * nloc:(p + 1) * nloc]
        panels = sorted(set(c // 8 for c in cols))
        assert panels == [p, p + 4]


def test_ipm_with_distributed_kkt_backend():
    """Full IPM with the KKT factorization sharded over the mesh must match
    the single-chip solve (ldlt_backend='distributed' via build_ipm)."""
    import uno_tpu
    from uno_tpu.options import preset
    from uno_tpu.solvers.ipm import (build_ipm, canonicalize_state,
                                     make_initial_state)
    from uno_tpu.model.library import scalable_quadratic

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("kkt",))
    nlp = scalable_quadratic(40, 12, seed=2)
    opts = preset("ipopt", scale_functions=False, ldlt_backend="distributed")
    prob, ws, step, run = build_ipm(nlp, opts, mesh=mesh)
    final = jax.block_until_ready(
        run(canonicalize_state(make_initial_state(prob, ws, opts))))
    res = uno_tpu.solve(nlp, preset="ipopt", scale_functions=False)
    assert res.success
    xd = np.asarray(final.x)[:nlp.n]
    np.testing.assert_allclose(xd, np.asarray(res.x), atol=1e-6)
