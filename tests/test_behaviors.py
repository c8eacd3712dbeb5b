"""MOI.Test-style end-to-end behaviors (reference CI tier 3: the
MathOptInterface.Test + MINLPTests suites run against the uno_ampl binary,
/root/reference/.github/julia/runtests_uno_ipopt_ma27.jl:25-120).  These
exercise API edge behaviors rather than solver math."""

import jax.numpy as jnp
import numpy as np
import pytest

import uno_tpu
from uno_tpu.model.nlp import INF, nlp_from_functions


def test_feasibility_problem_constant_objective():
    """Pure feasibility problem (constant f): find a point in the region."""
    nlp = nlp_from_functions(
        "feas", lambda x: jnp.asarray(0.0),
        lambda x: jnp.array([x[0] + x[1]]),
        x0=np.array([5.0, 5.0]),
        x_lb=np.zeros(2), x_ub=np.full(2, INF),
        c_lb=np.array([2.0]), c_ub=np.array([2.0]))
    res = uno_tpu.solve(nlp, preset="ipopt")
    assert res.success
    assert abs(res.x[0] + res.x[1] - 2.0) < 1e-6
    assert abs(res.objective) < 1e-12


def test_start_at_solution_converges_quickly():
    """x0 already optimal/KKT: must converge without leaving the point."""
    nlp = nlp_from_functions(
        "at_sol", lambda x: jnp.sum((x - 1.0) ** 2), None,
        x0=np.ones(3),
        x_lb=np.full(3, -INF), x_ub=np.full(3, INF))
    res = uno_tpu.solve(nlp, preset="ipopt")
    assert res.success
    assert np.allclose(res.x, 1.0, atol=1e-7)
    assert res.iterations <= 5


def test_fixed_variables_end_to_end():
    """l == u variables route through FixedBoundsConstraintsModel and come
    back fixed, with the rest optimized."""
    nlp = nlp_from_functions(
        "fixed", lambda x: jnp.sum((x - jnp.array([0.0, 2.0])) ** 2), None,
        x0=np.array([3.0, 0.0]),
        x_lb=np.array([3.0, -INF]), x_ub=np.array([3.0, INF]))
    res = uno_tpu.solve(nlp, preset="ipopt")
    assert res.success
    assert abs(res.x[0] - 3.0) < 1e-8     # stays fixed
    assert abs(res.x[1] - 2.0) < 1e-6     # optimized
    assert abs(res.objective - 9.0) < 1e-5


@pytest.mark.parametrize("preset", ["ipopt", "filtersqp", "byrd",
                                    "funnelsqp", "filterslp"])
def test_linear_program_all_presets(preset):
    """min -x1 - 2 x2 s.t. x1 + x2 <= 4, 0 <= x <= 3 -> (1, 3), f* = -7."""
    nlp = nlp_from_functions(
        "lp", lambda x: -x[0] - 2.0 * x[1],
        lambda x: jnp.array([x[0] + x[1]]),
        x0=np.array([0.5, 0.5]),
        x_lb=np.zeros(2), x_ub=np.full(2, 3.0),
        c_lb=np.array([-INF]), c_ub=np.array([4.0]))
    res = uno_tpu.solve(nlp, preset=preset)
    assert res.success, (preset, res.status)
    tol = 1e-4 if preset == "filterslp" else 1e-5
    assert abs(res.objective - (-7.0)) < tol, (preset, res.objective)


def test_equality_and_inequality_duals_signs():
    """AMPL/Uno dual conventions at the solution of a mixed problem:
    min x1^2 + x2^2 s.t. x1 + x2 = 1 (eq), x1 - x2 <= 1 (ineq inactive).
    Solution (0.5, 0.5); eq multiplier y with stationarity 2x - y*[1,1]
    - y2*[1,-1] = 0 -> y1 = 1, y2 = 0."""
    nlp = nlp_from_functions(
        "duals", lambda x: x[0] ** 2 + x[1] ** 2,
        lambda x: jnp.array([x[0] + x[1], x[0] - x[1]]),
        x0=np.array([2.0, 0.0]),
        x_lb=np.full(2, -INF), x_ub=np.full(2, INF),
        c_lb=np.array([1.0, -INF]), c_ub=np.array([1.0, 1.0]))
    res = uno_tpu.solve(nlp, preset="ipopt")
    assert res.success
    assert np.allclose(res.x, [0.5, 0.5], atol=1e-7)
    assert abs(res.y[0] - 1.0) < 1e-6
    assert abs(res.y[1]) < 1e-6
