"""Condensed (lifted) KKT formulation tests.

The Cholesky-based condensed backend must produce the same solutions as
the augmented LDL^T path — the tau relaxation is removed by the IPM's
iterative refinement — and its failed-Cholesky signal must drive the same
delta-bump regularization loop on nonconvex Hessians.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import uno_tpu
from uno_tpu.linalg.condensed import make_lifted_kkt_backend
from uno_tpu.model.library import acceptable_optima, get_problem


@pytest.mark.parametrize(
    "name", ["hs015", "hs071", "rosenbrock_eq",
             pytest.param("hs100", marks=pytest.mark.slow),
             pytest.param("hs038", marks=pytest.mark.slow)])
def test_lifted_matches_augmented(name):
    r_aug = uno_tpu.solve(get_problem(name), preset="ipopt")
    r_lift = uno_tpu.solve(get_problem(name), preset="ipopt",
                           kkt_formulation="lifted")
    assert r_lift.success, (name, r_lift.status)
    optima = acceptable_optima(name)
    if optima:
        err = min(abs(r_lift.objective - f) / max(1, abs(f)) for f in optima)
        assert err <= 1e-4, (name, r_lift.objective)
    np.testing.assert_allclose(r_lift.x, r_aug.x, atol=1e-5)


def test_lifted_backend_unit():
    """Direct solve of a saddle system must match numpy to refinement-free
    accuracy O(tau), and a non-PD condensed matrix must report the failure
    inertia."""
    rng = np.random.default_rng(0)
    n, m = 12, 4
    Q = rng.standard_normal((n, n))
    Hd = Q @ Q.T / n + 2 * np.eye(n)
    J = rng.standard_normal((m, n))
    C = np.full(m, 1e-8)
    A = np.block([[Hd, J.T], [J, -np.diag(C)]])
    rhs = rng.standard_normal(n + m)

    factorize, solve = make_lifted_kkt_backend(n, m, tau=1e-10)
    fac = factorize(jnp.asarray(A))
    assert int(fac.num_pos) == n and int(fac.num_neg) == m
    x = np.asarray(solve(fac, jnp.asarray(rhs)))
    x_ref = np.linalg.solve(A, rhs)
    assert np.max(np.abs(x - x_ref)) / max(1.0, np.max(np.abs(x_ref))) < 1e-5

    # indefinite Hd on null(J): Cholesky fails -> failure inertia reported
    A_bad = np.block([[-np.eye(n), J.T], [J, -np.diag(C)]])
    fac_bad = factorize(jnp.asarray(A_bad))
    assert int(fac_bad.num_zero) == n + m


def test_lifted_nonconvex_regularization_loop():
    """hs015's Hessian is indefinite along the way: the failed-Cholesky
    signal must drive delta bumps (not NaNs) and still converge."""
    res = uno_tpu.solve(get_problem("hs015"), preset="ipopt",
                        kkt_formulation="lifted")
    assert res.success
    assert abs(res.objective - 306.5) < 1e-2


def test_lifted_vmaps():
    """The condensed backend must vmap (batched solves)."""
    from uno_tpu.options import preset
    from uno_tpu.solvers.batch import solve_batch
    from uno_tpu.model.nlp import nlp_from_functions, INF

    def f(x, p):
        return jnp.sum((x - p) ** 2)

    def c(x, p):
        return jnp.array([x[0] + x[1] - 1.0])

    nlp = nlp_from_functions("b", f, c, x0=[0.5, 0.5],
                             x_lb=[-5.0, -5.0], x_ub=[5.0, 5.0],
                             c_lb=[0.0], c_ub=[INF], params=np.zeros(2))
    rng = np.random.default_rng(1)
    B = 8
    params = jnp.asarray(rng.uniform(-1, 2, (B, 2)))
    x0 = jnp.tile(jnp.asarray([0.5, 0.5]), (B, 1))
    res = solve_batch(nlp, preset("ipopt", scale_functions=False,
                                  kkt_formulation="lifted"), x0, params)
    assert res.num_solved == B
