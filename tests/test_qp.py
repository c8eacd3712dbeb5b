"""QP/LP interior-point kernel tests (fixed subproblems with known solutions,
the analogue of the reference's BQPDSolverTests/HiGHSSolverTests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from uno_tpu.options import Options
from uno_tpu.solvers.qp import (QP_INFEASIBLE, QP_OPTIMAL, QP_UNBOUNDED,
                                build_qp_solver, qp_structure_from_bounds)

INF = np.inf
OPTS = Options()


def solve_qp(g, H, J, rl, ru, dl, du, tol=1e-10):
    struct = qp_structure_from_bounds(rl, ru, dl, du)
    solver = build_qp_solver(struct, OPTS, tol=tol)
    return solver(jnp.asarray(g, dtype=jnp.float64), jnp.asarray(H, dtype=jnp.float64),
                  jnp.asarray(J, dtype=jnp.float64).reshape(len(rl), len(g)),
                  jnp.asarray(rl, dtype=jnp.float64), jnp.asarray(ru, dtype=jnp.float64),
                  jnp.asarray(dl, dtype=jnp.float64), jnp.asarray(du, dtype=jnp.float64))


def test_simple_equality_qp():
    # min 1/2(d1^2 + d2^2) - d1  s.t. d1 + d2 = 1 -> d = (1, 0), y: d1-1 = -y*...
    res = solve_qp(g=[-1.0, 0.0], H=np.eye(2), J=[[1.0, 1.0]],
                   rl=[1.0], ru=[1.0], dl=[-INF, -INF], du=[INF, INF])
    assert int(res.status) == QP_OPTIMAL
    assert np.allclose(np.asarray(res.d), [1.0, 0.0], atol=1e-7)
    # stationarity: H d + g - J^T y = 0 -> y = d2 = 0
    assert abs(float(res.y[0])) < 1e-6


def test_box_constrained_qp():
    # min 1/2||d - (2, -3)||^2 over box [-1, 1]^2 -> d = (1, -1)
    res = solve_qp(g=[-2.0, 3.0], H=np.eye(2), J=np.zeros((0, 2)),
                   rl=[], ru=[], dl=[-1.0, -1.0], du=[1.0, 1.0])
    assert int(res.status) == QP_OPTIMAL
    assert np.allclose(np.asarray(res.d), [1.0, -1.0], atol=1e-7)
    # bound duals: zl(-1)=0, at upper for d1: zu1 = d1 - 2 = -1
    assert abs(float(res.zu[0]) - (-1.0)) < 1e-6
    assert abs(float(res.zl[1]) - 2.0) < 1e-6


def test_inequality_qp_hs35_shape():
    # classic HS35: min as QP with one linear inequality
    H = np.array([[4.0, 2.0, 2.0], [2.0, 4.0, 0.0], [2.0, 0.0, 2.0]])
    g = np.array([-8.0, -6.0, -4.0])
    res = solve_qp(g=g, H=H, J=[[-1.0, -1.0, -2.0]], rl=[-3.0], ru=[INF],
                   dl=[0.0, 0.0, 0.0], du=[INF, INF, INF])
    assert int(res.status) == QP_OPTIMAL
    d = np.asarray(res.d)
    # optimum of hs035 shifted: x* = (4/3, 7/9, 4/9)
    assert np.allclose(d, [4/3, 7/9, 4/9], atol=1e-6)


def test_lp():
    # pure LP: min -d1 - d2 s.t. d1 + d2 <= 1, box [0, 5] -> opt on facet
    res = solve_qp(g=[-1.0, -1.0], H=np.zeros((2, 2)), J=[[1.0, 1.0]],
                   rl=[-INF], ru=[1.0], dl=[0.0, 0.0], du=[5.0, 5.0])
    assert int(res.status) == QP_OPTIMAL
    assert abs(float(res.d[0] + res.d[1]) - 1.0) < 1e-7
    assert abs(float(res.y[0]) - (-1.0)) < 1e-6  # upper-bound active: y < 0


def test_indefinite_qp_convexified():
    # nonconvex QP in a box: internal convexification still returns a point
    # in the box with finite objective
    H = np.array([[-2.0, 0.0], [0.0, 1.0]])
    res = solve_qp(g=[0.0, -1.0], H=H, J=np.zeros((0, 2)),
                   rl=[], ru=[], dl=[-1.0, -1.0], du=[1.0, 1.0])
    assert int(res.status) == QP_OPTIMAL
    d = np.asarray(res.d)
    assert np.all(d >= -1 - 1e-8) and np.all(d <= 1 + 1e-8)


def test_infeasible_qp_detected():
    # d <= -1 and d >= 1 simultaneously (two rows conflict)
    res = solve_qp(g=[0.0], H=np.eye(1), J=[[1.0], [1.0]],
                   rl=[1.0, -INF], ru=[INF, -1.0], dl=[-INF], du=[INF])
    assert int(res.status) in (QP_INFEASIBLE, 3)
    assert int(res.status) != QP_OPTIMAL


def test_unbounded_lp_detected():
    res = solve_qp(g=[-1.0], H=np.zeros((1, 1)), J=np.zeros((0, 1)),
                   rl=[], ru=[], dl=[0.0], du=[INF])
    assert int(res.status) in (QP_UNBOUNDED, 3)


def test_two_sided_range_constraint():
    # -1 <= d1 - d2 <= 1 active at upper; min -(d1 - d2)
    res = solve_qp(g=[-1.0, 1.0], H=np.eye(2) * 0.0 + np.eye(2), J=[[1.0, -1.0]],
                   rl=[-1.0], ru=[1.0], dl=[-INF, -INF], du=[INF, INF])
    assert int(res.status) == QP_OPTIMAL
    assert abs(float(res.d[0] - res.d[1]) - 1.0) < 1e-6


def test_qp_warmstart_reduces_iterations():
    """IP-QP warmstart (BQPD active-set-reuse analogue): re-solving from the
    previous solution converges in far fewer barrier iterations."""
    from uno_tpu.options import preset
    from uno_tpu.solvers.qp import QPStructure, build_qp_solver
    rng = np.random.default_rng(7)
    n, m = 12, 4
    Q = rng.standard_normal((n, n)); H = Q @ Q.T + np.eye(n)
    g = rng.standard_normal(n)
    J = rng.standard_normal((m, n))
    rl = np.full(m, -1.0); ru = np.full(m, 1.0)
    dl = np.full(n, -2.0); du = np.full(n, 2.0)
    struct = QPStructure(n=n, m=m,
                         has_dl=np.ones(n, bool), has_du=np.ones(n, bool),
                         is_eq=np.zeros(m, bool),
                         has_rl=np.ones(m, bool), has_ru=np.ones(m, bool))
    solve = build_qp_solver(struct, preset("filtersqp"), tol=1e-10)
    cold = solve(jnp.asarray(g), jnp.asarray(H), jnp.asarray(J),
                 jnp.asarray(rl), jnp.asarray(ru), jnp.asarray(dl), jnp.asarray(du))
    assert int(cold.status) == 0
    warm = solve(jnp.asarray(g), jnp.asarray(H), jnp.asarray(J),
                 jnp.asarray(rl), jnp.asarray(ru), jnp.asarray(dl), jnp.asarray(du),
                 warm_d=np.asarray(cold.d), warm_y=np.asarray(cold.y))
    assert int(warm.status) == 0
    assert np.max(np.abs(np.asarray(warm.d) - np.asarray(cold.d))) < 1e-6
    assert int(warm.iterations) < int(cold.iterations)
    # shrunk trust region (BQPD mode on radius decrease): still correct
    warm2 = solve(jnp.asarray(g), jnp.asarray(H), jnp.asarray(J),
                  jnp.asarray(rl), jnp.asarray(ru),
                  jnp.asarray(dl * 0.25), jnp.asarray(du * 0.25),
                  warm_d=np.asarray(cold.d), warm_y=np.asarray(cold.y))
    assert int(warm2.status) == 0
    assert np.max(np.abs(np.asarray(warm2.d))) <= 0.5 + 1e-8
