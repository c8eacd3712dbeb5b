"""End-to-end SQP-path preset tests (filtersqp / funnelsqp / byrd / filterslp).

Problem subset chosen for CPU test runtime; the full library sweep lives in
the benchmark harness.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import uno_tpu
from uno_tpu.model.library import acceptable_optima, get_problem
from uno_tpu.model.nlp import nlp_from_functions, INF


def check(name, preset, max_iterations=200, rtol=1e-4):
    nlp = get_problem(name)
    res = uno_tpu.solve(nlp, preset=preset, max_iterations=max_iterations)
    # FEASIBLE_SMALL_STEP at a feasible point is a legitimate reference
    # terminal (TrustRegionStrategy.cpp:150-166); the objective check below
    # still pins it to the optimum
    ok = res.success or (res.status == "feasible_small_step"
                         and res.primal_feasibility <= 1e-5)
    assert ok, f"{name}/{preset}: {res.status}"
    optima = acceptable_optima(name)
    err = min(abs(res.objective - f) / max(1.0, abs(f)) for f in optima)
    assert err <= rtol, f"{name}/{preset}: f={res.objective}, expected {optima}"
    return res


@pytest.mark.parametrize("name", ["hs014", "hs015", "hs016", "hs035", "hs071", "hs100",
                                  "polak5"])
def test_filtersqp(name):
    # polak5 exercises the feasible-to-tolerance restoration exit (an h=0
    # filter entry makes the beta-reduction test unsatisfiable)
    check(name, "filtersqp")


@pytest.mark.parametrize("name", ["hs014", "hs015", "hs071"])
def test_funnelsqp(name):
    check(name, "funnelsqp")


@pytest.mark.parametrize("name", ["hs010", "hs015", "hs035", "hs048"])
def test_byrd(name):
    check(name, "byrd")


def test_filterslp_on_lp_like_problem():
    # SLP converges finitely on (nearly) linear problems
    def f(x):
        return x[0] + x[1]

    def c(x):
        return jnp.array([x[0] + 2.0 * x[1]])

    nlp = nlp_from_functions("lp1", f, c, x0=[2.0, 2.0],
                             x_lb=[0.0, 0.0], x_ub=[INF, INF],
                             c_lb=[2.0], c_ub=[INF])
    res = uno_tpu.solve(nlp, preset="filterslp", max_iterations=100)
    assert res.status in ("optimal", "almost_optimal", "feasible_small_step")
    assert abs(res.objective - 1.0) < 1e-4  # optimum at (0, 1)


def test_filtersqp_restoration_on_infeasible_start():
    # equality circle constraint with far-away start passes through restoration
    res = check("rosenbrock_eq", "filtersqp")
    assert res.primal_feasibility <= 1e-6


def test_filtersqp_multipliers_at_solution():
    res = check("hs015", "filtersqp")
    # known multipliers at (0.5, 2): y1 = 700, zu1 = -1751
    assert abs(res.y[0] - 700.0) < 1.0
    assert abs(res.zl[0]) < 1e-6
    assert res.y[1] == pytest.approx(0.0, abs=1e-6)


def test_byrd_penalty_steering_reaches_feasibility():
    res = check("polak5", "byrd", max_iterations=200)
    assert res.primal_feasibility <= 1e-6


def test_hessian_model_identity_sqp():
    """identity Hessian on the SQP path (reference IdentityHessian.cpp)."""
    import uno_tpu
    from uno_tpu.model.library import get_problem
    res = uno_tpu.solve(get_problem("hs021"), preset="filtersqp",
                        hessian_model="identity", max_iterations=500)
    # the TR small-step exit at a feasible near-KKT point is a legitimate
    # reference outcome (TrustRegionStrategy.cpp:150-166 ->
    # FEASIBLE_SMALL_STEP, .sol solve_code 100) — the identity-Hessian
    # model converges linearly, so the last radius can collapse first
    assert res.success or res.status == "feasible_small_step", res.status
    assert abs(res.objective - (-99.96)) < 1e-2


def test_sqp_history_and_callbacks():
    """solve_sqp(history=True) returns the accepted-iterate trace, and all
    three UserCallbacks hooks fire (tools/UserCallbacks.hpp:13-31)."""
    from uno_tpu.model.library import get_problem

    calls = {"primals": 0, "multipliers": 0, "acceptable": 0}

    class Probe:
        def notify_new_primals(self, primals):
            calls["primals"] += 1

        def notify_new_multipliers(self, multipliers):
            calls["multipliers"] += 1

        def notify_acceptable_iterate(self, primals, multipliers, om):
            calls["acceptable"] += 1

    res = uno_tpu.solve(get_problem("hs015"), preset="filtersqp",
                        callbacks=Probe(), history=True)
    assert res.success
    assert res.history is not None and len(res.history) >= 2
    assert calls["primals"] >= 1
    assert calls["multipliers"] >= 1
    assert calls["acceptable"] >= 1
