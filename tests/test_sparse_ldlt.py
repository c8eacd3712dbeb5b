"""General static-sparsity supernodal LDL^T (linalg/sparse_ldlt.py).

The functional-test analogue of the reference's per-solver fixed-system
tests (unotest/functional_tests/MA57SolverTests.cpp class, SURVEY.md §4):
fixed sparse symmetric-indefinite systems with known inertia, checked
against the dense LDL^T, plus the fill-reducing symbolic analysis
(MA57Solver.cpp:40-90 equivalent) on KKT patterns with zero dual diagonal.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import uno_tpu
from uno_tpu.linalg.ldlt import ldlt_factor
from uno_tpu.linalg.sparse_ldlt import (build_plan, make_sparse_ldlt,
                                        minimum_degree)
from uno_tpu.model.library import get_problem


def _check_against_dense(A, is_dual=None, rtol=1e-9):
    N = A.shape[0]
    plan = build_plan(A != 0, is_dual)
    fac_fn, solve_fn = make_sparse_ldlt(plan)
    fac = fac_fn(jnp.asarray(A))
    dref = ldlt_factor(jnp.asarray(A[plan.perm][:, plan.perm]))
    assert int(fac.num_pos) == int(dref.num_pos)
    assert int(fac.num_neg) == int(dref.num_neg)
    assert int(fac.num_zero) == int(dref.num_zero)
    rng = np.random.default_rng(7)
    rhs = rng.standard_normal(N)
    x = np.asarray(solve_fn(fac, jnp.asarray(rhs)))
    resid = np.linalg.norm(A @ x - rhs) / max(1.0, np.linalg.norm(rhs))
    assert resid < rtol, resid
    return plan


def test_banded_spd():
    N = 40
    A = np.zeros((N, N))
    for i in range(N):
        A[i, i] = 4.0
        if i + 1 < N:
            A[i, i + 1] = A[i + 1, i] = -1.0
        if i + 3 < N:
            A[i, i + 3] = A[i + 3, i] = -0.5
    plan = _check_against_dense(A)
    # symbolic analysis must keep a banded problem sparse
    assert plan.nnz_factor < N * 8


def test_arrow_indefinite():
    """Dense last row/column — the pattern RCM cannot reduce; minimum
    degree orders the arrow spike last and the factor stays O(N)."""
    rng = np.random.default_rng(1)
    N = 40
    A = np.diag(rng.standard_normal(N) + 3.0)
    A[-1, :] = rng.standard_normal(N) * 0.5
    A[:, -1] = A[-1, :]
    A[-1, -1] = -2.0
    plan = _check_against_dense(A)
    assert plan.nnz_factor < 3 * N
    # the spike must be eliminated last
    assert plan.perm[-1] == N - 1


def test_random_sparse_indefinite():
    rng = np.random.default_rng(2)
    N = 60
    M = np.zeros((N, N))
    for i, j in rng.integers(0, N, size=(150, 2)):
        v = rng.standard_normal()
        M[i, j] += v
        M[j, i] += v
    M += np.diag(rng.standard_normal(N) * 3)
    _check_against_dense(M)


def test_kkt_zero_dual_diagonal():
    """Augmented KKT with a structurally ZERO (2,2) block: the
    dual-eligibility rule must order every constraint-dual row after one of
    its primal neighbors so its pivot has received a Schur update."""
    rng = np.random.default_rng(3)
    n, m = 30, 12
    H = np.zeros((n, n))
    for i in range(n):
        H[i, i] = 2.0 + rng.random()
        if i + 1 < n:
            H[i, i + 1] = H[i + 1, i] = 0.3
    J = np.zeros((m, n))
    for r in range(m):
        J[r, rng.choice(n, size=3, replace=False)] = rng.standard_normal(3)
    K = np.block([[H, J.T], [J, np.zeros((m, m))]])
    is_dual = np.zeros(n + m, bool)
    is_dual[n:] = True
    plan = _check_against_dense(K, is_dual)
    # inertia of a PD-reduced KKT is (n, m, 0) — verified inside the check
    # against the dense factorization; also each dual row is ordered after
    # at least one primal neighbor
    pos_of = np.empty(n + m, dtype=int)
    pos_of[plan.perm] = np.arange(n + m)
    for r in range(m):
        cols = np.nonzero(J[r])[0]
        assert pos_of[n + r] > pos_of[cols].min()


def test_minimum_degree_is_permutation():
    rng = np.random.default_rng(4)
    N = 25
    A = rng.random((N, N)) < 0.15
    perm = minimum_degree(A)
    assert np.array_equal(np.sort(perm), np.arange(N))


def test_singular_matrix_flagged():
    """A structurally singular system must report num_zero > 0, the signal
    the regularization loop keys on (same contract as the dense LDL^T)."""
    A = np.zeros((6, 6))
    A[0, 0] = 2.0
    A[1, 1] = 3.0
    A[2, 3] = A[3, 2] = 1.0
    A[2, 2] = 1.0
    A[4, 4] = 1.0
    # row/col 5 entirely zero -> exact zero pivot
    plan = build_plan(A != 0)
    fac_fn, _ = make_sparse_ldlt(plan)
    fac = fac_fn(jnp.asarray(A))
    assert int(fac.num_zero) >= 1


def test_f32_factor_dtype():
    """The backend is dtype-generic (regularize_and_factor casts to the
    configured kkt_dtype): f32 factorization must work and report the same
    inertia."""
    rng = np.random.default_rng(5)
    N = 30
    A = np.zeros((N, N))
    for i in range(N):
        A[i, i] = 3.0
        if i + 2 < N:
            A[i, i + 2] = A[i + 2, i] = -0.7
    plan = build_plan(A != 0)
    fac_fn, solve_fn = make_sparse_ldlt(plan)
    fac = fac_fn(jnp.asarray(A, dtype=jnp.float32))
    assert fac.dvec.dtype == jnp.float32
    assert int(fac.num_pos) == N
    rhs = rng.standard_normal(N).astype(np.float32)
    x = np.asarray(solve_fn(fac, jnp.asarray(rhs)))
    assert np.linalg.norm(A @ x - rhs) < 1e-3


# ---------------------------------------------------------------------------
# end-to-end: the irregular class the banded/RCM detection declines
# ---------------------------------------------------------------------------

def test_ipm_sparse_matches_dense_steering():
    """steering (arrow-coupled control staircase, the class RCM declines,
    round-4 verdict item 1): the sparse-KKT backend must reproduce the
    dense path's iterates exactly — same iteration count, same objective."""
    nlp = get_problem("steering_n26")
    rd = uno_tpu.solve(nlp, preset="ipopt")
    rs = uno_tpu.solve(nlp, preset="ipopt", kkt_formulation="sparse")
    from uno_tpu.linalg import sparse_kkt
    assert sparse_kkt.last_detection_report.route == "sparse"
    assert rs.status == rd.status == "optimal"
    assert rs.iterations == rd.iterations
    assert abs(rs.objective - rd.objective) < 1e-10 * max(1, abs(rd.objective))


@pytest.mark.slow
def test_ipm_sparse_matches_dense_polygon_elec():
    for name in ("polygon_k6", "elec_n9", "vanderpol_ctrl_n15"):
        nlp = get_problem(name)
        rd = uno_tpu.solve(nlp, preset="ipopt")
        rs = uno_tpu.solve(nlp, preset="ipopt", kkt_formulation="sparse")
        assert rs.status == rd.status, name
        assert rs.iterations == rd.iterations, name
        assert abs(rs.objective - rd.objective) \
            < 1e-8 * max(1, abs(rd.objective)), name


def test_auto_routing_declines_dense_coupling():
    """chandheq-class all-pairs coupling: the auto route must measure the
    density and stay dense (MA57's fronts are dense there too), recording
    an honest reason."""
    nlp = get_problem("chandheq_ls_n10")
    res = uno_tpu.solve(nlp, preset="ipopt", auto_permute=True)
    assert res.success
    from uno_tpu.linalg import sparse_kkt
    rep = sparse_kkt.last_detection_report
    assert rep is not None and rep.route == "dense"
    assert "dense" in rep.reason
