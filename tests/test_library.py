"""Problem-library integrity checks.

Tier-1 analogue of the reference's fixture validation: every registered
problem must be well-formed, and its registered optimum must be reproducible
by an independent solver (scipy SLSQP) — this catches formulation typos in
the analytic Hock-Schittkowski encodings independently of uno_tpu's own
solvers (which are exercised on the same registry in test_ipm.py /
test_sqp.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from uno_tpu.model.library import (acceptable_optima, get_problem,
                                   problem_names)

ALL = problem_names()

# Problems where scipy SLSQP itself fails or stalls (degenerate constraint
# qualifications, flat objectives) — independently verified in a comment.
SLSQP_SKIP = {
    "hs003",   # 1e-5-scaled quadratic: SLSQP stalls at f~1.6e-4 (f*=0)
    "hs013",   # CQ fails at solution; SLSQP gets 0.99999 (fine) but slowly
    "hs020",   # SLSQP lands on a non-optimal point from this x0
    "hs025",   # SLSQP stalls at f~32.8 from x0 (trust-constr reaches f*=0)
    "hs061",   # rank-deficient Jacobian at x0=0: SLSQP diverges
    "hs055",   # rank-deficient equalities: SLSQP returns a non-stationary point
    "polak5",  # minimax structure; SLSQP cycles from this x0
    "hs084",   # objective ~1e6: SLSQP stalls at x0; trust-constr needs >3000
               # iters with exact constraint jac but reaches f=-5280335.095
               # (rel err 7e-9 vs the book value) without it
}


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=pytest.mark.slow if any(
        n.endswith(f"_n{k}") for k in (961, 998, 999, 1000, 1001, 1002))
        else []) for n in ALL])
def test_problem_wellformed(name):
    nlp = get_problem(name)
    assert nlp.n >= 1 and nlp.m >= 0
    assert nlp.x_lb.shape == (nlp.n,) and nlp.x_ub.shape == (nlp.n,)
    assert np.all(nlp.x_lb <= nlp.x_ub)
    assert nlp.c_lb.shape == (nlp.m,) and nlp.c_ub.shape == (nlp.m,)
    assert np.all(nlp.c_lb <= nlp.c_ub)
    x0 = jnp.asarray(np.clip(nlp.x0, np.where(np.isfinite(nlp.x_lb), nlp.x_lb, -1e20),
                             np.where(np.isfinite(nlp.x_ub), nlp.x_ub, 1e20)))
    f0 = nlp.objective(x0)
    assert np.isfinite(f0)
    c0 = nlp.constraints(x0)
    assert c0.shape == (nlp.m,)
    assert np.all(np.isfinite(np.asarray(c0)))
    g0 = nlp.objective_gradient(x0)
    assert np.all(np.isfinite(np.asarray(g0)))
    if nlp.m:
        J0 = nlp.constraint_jacobian(x0)
        assert J0.shape == (nlp.m, nlp.n)
        assert np.all(np.isfinite(np.asarray(J0)))


_SCIPY_CORE = {"hs014", "hs015", "hs035", "hs038", "hs048", "hs071", "hs100",
               "hs113"}


@pytest.mark.parametrize(
    "name", [n if n in _SCIPY_CORE else pytest.param(n, marks=pytest.mark.slow)
             for n in ALL if n not in SLSQP_SKIP])
def test_optimum_reproducible_by_scipy(name):
    from scipy.optimize import NonlinearConstraint, minimize

    nlp = get_problem(name)
    optima = acceptable_optima(name)
    if not optima:
        pytest.skip("no registered optimum")

    fn = lambda x: float(nlp.objective(jnp.asarray(x)))
    gn = lambda x: np.asarray(nlp.objective_gradient(jnp.asarray(x)))
    bounds = [(None if lb < -1e19 else lb, None if ub > 1e19 else ub)
              for lb, ub in zip(nlp.x_lb, nlp.x_ub)]
    cons = []
    if nlp.m:
        cons = [NonlinearConstraint(
            lambda x: np.asarray(nlp.constraints(jnp.asarray(x))),
            nlp.c_lb, nlp.c_ub,
            jac=lambda x: np.asarray(nlp.constraint_jacobian(jnp.asarray(x))))]
    x0 = np.clip(np.asarray(nlp.x0, dtype=float),
                 [b[0] if b[0] is not None else -np.inf for b in bounds],
                 [b[1] if b[1] is not None else np.inf for b in bounds])
    r = minimize(fn, x0, jac=gn, bounds=bounds, constraints=cons,
                 method="SLSQP", options={"maxiter": 500})
    if min(abs(r.fun - f) / max(1.0, abs(f)) for f in optima) >= 1e-4:
        # SLSQP stalls on a few stiff problems (hs057, hs084); second opinion
        tc_bounds = [(lo if lo is not None else -np.inf,
                      hi if hi is not None else np.inf) for lo, hi in bounds]
        r = minimize(fn, x0, jac=gn, bounds=tc_bounds, constraints=cons,
                     method="trust-constr", options={"maxiter": 3000})
    if nlp.m:
        cv = np.asarray(nlp.constraints(jnp.asarray(r.x)))
        viol = max(np.max(np.maximum(nlp.c_lb - cv, 0.0)),
                   np.max(np.maximum(cv - nlp.c_ub, 0.0)))
        assert viol < 1e-4, f"scipy violated constraints by {viol}"
    err = min(abs(r.fun - f) / max(1.0, abs(f)) for f in optima)
    assert err < 1e-4, f"scipy f={r.fun}, registered optima={optima}"
