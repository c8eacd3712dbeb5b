"""End-to-end IPM (ipopt preset) tests on the built-in problem library.

Mirrors the reference's CI tier: end-to-end preset runs against problems
with known optima at atol/rtol 1e-4 (SURVEY.md §4,
.github/julia/runtests_uno_ipopt_ma27.jl).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import uno_tpu
from uno_tpu.model.library import (acceptable_optima, get_problem,
                                   problem_names)

ALL = problem_names()

# Representative core subset for the default (fast) suite run: covers
# equality/inequality/bound-only/degenerate/minimax/larger-n structures.
# The full 97-problem sweep runs under --runslow (and via tools/sweep.py).
CORE = {
    "hs013", "hs014", "hs015", "hs016", "hs020", "hs023", "hs035", "hs038",
    "hs044", "hs048", "hs055", "hs061", "hs071", "hs076", "hs083", "hs093",
    "hs099", "hs100", "hs104", "hs108", "hs111", "hs116", "hs118", "polak5",
}


# Problems whose constraint qualification fails at the solution: first-order
# methods stall slightly short of the optimum (IPOPT-class behavior); accept
# a looser objective error there.
DEGENERATE_TOL = {"hs013": 1e-2}


@pytest.mark.parametrize(
    "name", [n if n in CORE else pytest.param(n, marks=pytest.mark.slow)
             for n in ALL])
def test_ipopt_preset(name):
    nlp = get_problem(name)
    res = uno_tpu.solve(nlp, preset="ipopt")
    assert res.success, f"{name}: {res.status}"
    optima = acceptable_optima(name)
    if optima:
        err = min(abs(res.objective - f) / max(1.0, abs(f)) for f in optima)
        assert err <= DEGENERATE_TOL.get(name, 1e-4), \
            f"{name}: f={res.objective}, acceptable={optima}"
    # residuals of the ORIGINAL problem at the reported solution
    assert res.primal_feasibility <= 1e-6
    assert res.stationarity <= 1e-5  # scaled


def test_kkt_conditions_at_solution():
    """Verify the returned multipliers satisfy KKT of the *original* problem."""
    nlp = get_problem("hs071")
    res = uno_tpu.solve(nlp, preset="ipopt")
    x = jnp.asarray(res.x)
    g = np.asarray(nlp.objective_gradient(x))
    J = np.asarray(nlp.constraint_jacobian(x))
    grad_lag = g - J.T @ res.y - res.zl - res.zu
    assert np.max(np.abs(grad_lag)) < 1e-5
    # sign conventions: zl >= 0, zu <= 0; ineq multiplier y1 >= 0 (lower bound)
    assert np.all(res.zl >= -1e-10) and np.all(res.zu <= 1e-10)
    assert res.y[0] >= -1e-10


def test_restoration_phase_triggers_and_recovers():
    """A problem whose optimality steps fail early should pass through the
    feasibility restoration phase and still converge (hs015 does on this
    solver — verified in the iteration trace)."""
    nlp = get_problem("hs015")
    res = uno_tpu.solve(nlp, preset="ipopt")
    assert res.success
    assert abs(res.objective - 306.5) < 1e-3


def test_unconstrained_bound_only():
    res = uno_tpu.solve(get_problem("hs038"), preset="ipopt")
    assert res.success and res.objective < 1e-10


def test_infeasible_problem_detected():
    # x^2 <= -1 is infeasible everywhere
    nlp = uno_tpu.nlp_from_functions(
        "infeasible", lambda x: (x[0] - 1.0) ** 2,
        lambda x: jnp.array([x[0] ** 2 + 1.0]),
        x0=[2.0], c_lb=[-np.inf], c_ub=[0.0])
    res = uno_tpu.solve(nlp, preset="ipopt", max_iterations=300)
    assert res.status in ("infeasible_stationary_point", "algorithmic_error",
                          "iteration_limit")
    # must not claim optimality
    assert not res.success


def test_unbounded_problem_detected():
    nlp = uno_tpu.nlp_from_functions("unbounded", lambda x: x[0], None, x0=[0.0])
    res = uno_tpu.solve(nlp, preset="ipopt", max_iterations=300)
    assert res.status == "unbounded"


def test_option_overrides():
    nlp = get_problem("hs035")
    res_loose = uno_tpu.solve(nlp, preset="ipopt", tolerance=1e-4)
    assert res_loose.success
    assert res_loose.iterations <= 10


def test_max_iterations_respected():
    nlp = get_problem("hs015")
    res = uno_tpu.solve(nlp, preset="ipopt", max_iterations=3)
    assert res.status == "iteration_limit"
    assert res.iterations == 3


def test_equality_only_problem():
    res = uno_tpu.solve(get_problem("hs048"), preset="ipopt")
    assert res.success and abs(res.objective) < 1e-8


def test_larger_scale_chained_rosenbrock():
    from uno_tpu.model.library import chained_rosenbrock
    nlp = chained_rosenbrock(50)
    res = uno_tpu.solve(nlp, preset="ipopt")
    assert res.success
    assert res.primal_feasibility <= 1e-8


def test_larger_scale_quadratic_vs_scipy():
    from uno_tpu.model.library import scalable_quadratic
    from scipy.optimize import minimize
    nlp = scalable_quadratic(40, 10, seed=2)
    res = uno_tpu.solve(nlp, preset="ipopt")
    assert res.success
    r = minimize(lambda x: float(nlp.objective(jnp.asarray(x))), np.zeros(40),
                 jac=lambda x: np.asarray(nlp.objective_gradient(jnp.asarray(x))),
                 method="SLSQP", bounds=[(-2, 2)] * 40,
                 constraints=[{"type": "ineq",
                               "fun": lambda x: -np.asarray(nlp.constraints(jnp.asarray(x)))}],
                 options={"ftol": 1e-12, "maxiter": 500})
    assert abs(res.objective - r.fun) < 1e-5 * max(1, abs(r.fun))


def test_hessian_model_identity_ipm():
    """Hessian models (reference hessian_models/: exact|identity|zero) on the
    IPM path: a convex QP converges even without exact curvature."""
    nlp = get_problem("hs021")
    res = uno_tpu.solve(nlp, preset="ipopt", hessian_model="identity",
                        max_iterations=500)
    assert res.success, f"identity: {res.status}"
    assert abs(res.objective - (-99.96)) < 1e-2


def test_hessian_model_zero_ipm_progresses():
    """zero Hessian + barrier = SLP-like creep (curvature only from the
    regularization δI); like the reference, it progresses but is meant for
    the TR/SLP path — assert steady progress, not convergence."""
    nlp = get_problem("hs021")
    res = uno_tpu.solve(nlp, preset="ipopt", hessian_model="zero",
                        max_iterations=300)
    assert abs(res.objective - (-99.96)) < 0.2


@pytest.mark.parametrize("gs", ["fletcher_filter_method", "funnel_method",
                                "l1_merit"])
def test_globalization_strategies_ipm(gs):
    """Any globalization strategy combines with the IPM (reference
    GlobalizationStrategyFactory.cpp; only IPM+TR is excluded)."""
    for name, f_star in [("hs015", 306.5), ("hs071", 17.0140173)]:
        res = uno_tpu.solve(get_problem(name), preset="ipopt",
                            globalization_strategy=gs)
        assert res.success, f"{gs}/{name}: {res.status}"
        assert abs(res.objective - f_star) < 1e-3 * max(1, abs(f_star))


def test_nonmonotone_filter_ipm():
    """filter_type=nonmonotone on the IPM path (NonmonotoneFilter.cpp)."""
    res = uno_tpu.solve(get_problem("hs015"), preset="ipopt",
                        filter_type="nonmonotone")
    assert res.success
    assert abs(res.objective - 306.5) < 1e-3


def test_time_limit_respected():
    """Finite time_limit terminates with status time_limit
    (reference OptimizationStatus::TIME_LIMIT, Uno.cpp:137-140)."""
    from uno_tpu.model.library import chained_rosenbrock
    nlp = chained_rosenbrock(60)
    res = uno_tpu.solve(nlp, preset="ipopt", time_limit=1e-9)
    assert res.status == "time_limit"


def test_history_returned():
    """solve_ipm(history=True) returns the per-iteration state trace
    (Result.history), one IPMState per accepted iterate + the initial one."""
    res = uno_tpu.solve(get_problem("hs015"), preset="ipopt", history=True)
    assert res.success
    assert res.history is not None
    assert len(res.history) == res.iterations + 1
    # the trace is usable: mu is monotonically non-increasing (monotone
    # Fiacco-McCormick schedule, BarrierParameterUpdateStrategy.cpp:33-63)
    mus = [float(s.mu) for s in res.history]
    assert all(b <= a + 1e-12 for a, b in zip(mus, mus[1:]))


def test_user_callbacks_all_hooks():
    """All three UserCallbacks hooks fire (tools/UserCallbacks.hpp:13-31):
    notify_new_primals/notify_new_multipliers per accepted iterate,
    notify_acceptable_iterate at the end."""
    from uno_tpu.utils.callbacks import RecordingCallbacks

    calls = {"primals": 0, "multipliers": 0, "acceptable": 0}

    class Probe(RecordingCallbacks):
        def notify_new_primals(self, primals):
            calls["primals"] += 1

        def notify_new_multipliers(self, multipliers):
            calls["multipliers"] += 1
            assert multipliers.shape == (2,)

        def notify_acceptable_iterate(self, primals, multipliers, om):
            calls["acceptable"] += 1

    res = uno_tpu.solve(get_problem("hs015"), preset="ipopt", callbacks=Probe())
    assert res.success
    assert calls["primals"] == res.iterations
    assert calls["multipliers"] == res.iterations
    assert calls["acceptable"] == 1


def test_bound_complementarity_priority():
    """Round-5 regression (the fused-filtersqp stall-tail root cause): on a
    TWO-SIDED variable the lower product zl*(x-lb) must take priority over
    the upper product when zl > 0 — the reference checks lower FIRST
    (OptimizationProblem.cpp:152-165).  The inverted priority let a
    far-from-active lower bound's dual dust hide behind a tiny upper
    product, so QPs under a trust region (every variable two-sided)
    terminated with unconverged complementarity."""
    import jax.numpy as jnp
    from uno_tpu.ingredients import barrier as bar

    x = jnp.array([0.5])
    lb = jnp.array([0.0])
    ub = jnp.array([10.0])
    has = jnp.array([True])
    zl = jnp.array([0.2])      # positive dual on a NON-active lower bound
    zu = jnp.array([-1e-9])    # tiny upper dust, far bound
    e = bar.bound_complementarity_error(x, zl, zu, lb, ub, has, has)
    # the lower product 0.2*0.5 = 0.1 must be reported, not the upper dust
    assert abs(float(e[0]) - 0.1) < 1e-12
    # with zl <= 0 the upper product is reported
    e2 = bar.bound_complementarity_error(x, jnp.array([0.0]), zu, lb, ub,
                                         has, has)
    assert abs(float(e2[0]) - float(zu[0] * (x[0] - ub[0]))) < 1e-15
