"""Structured scenario-NLP IPM tests (block-arrow Schur KKT path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import uno_tpu
from uno_tpu.model.nlp import nlp_from_functions, INF
from uno_tpu.solvers.structured import ScenarioNLP, solve_structured_ipm


def make_two_stage(S=4, seed=0):
    """min ||x0 - 1||^2 + sum_s ||xs - a_s||^2
       s.t. per scenario: xs_1 + xs_2 + 0.1*x0_1^2 = b_s; xs >= 0."""
    rng = np.random.default_rng(seed)
    n0, ns, m = 2, 3, 1
    a = rng.uniform(-0.5, 1.5, (S, ns))
    b = rng.uniform(1.0, 2.0, (S, 1))

    def f0(x0):
        return jnp.sum((x0 - 1.0) ** 2)

    def fs(x0, xs, p):
        return jnp.sum((xs - p["a"]) ** 2)

    def cs(x0, xs, p):
        return jnp.array([xs[0] + xs[1] + 0.1 * x0[0] ** 2 - p["b"][0]])

    return ScenarioNLP(
        name="two_stage", n0=n0, ns=ns, m=m, S=S,
        f0=f0, fs=fs, cs=cs,
        x0_lb=np.full(n0, -INF), x0_ub=np.full(n0, INF),
        xs_lb=np.zeros(ns), xs_ub=np.full(ns, INF),
        x0_init=np.full(n0, 0.5), xs_init=np.full((S, ns), 0.5),
        params={"a": jnp.asarray(a), "b": jnp.asarray(b)},
    )


def monolithic_solution(snlp):
    """Reference: solve the same problem flattened through the regular IPM."""
    S, n0, ns, m = snlp.S, snlp.n0, snlp.ns, snlp.m
    a = np.asarray(snlp.params["a"])
    b = np.asarray(snlp.params["b"])

    def f(z):
        x0 = z[:n0]
        xs = z[n0:].reshape(S, ns)
        return snlp.f0(x0) + jnp.sum((xs - a) ** 2)

    def c(z):
        x0 = z[:n0]
        xs = z[n0:].reshape(S, ns)
        return xs[:, 0] + xs[:, 1] + 0.1 * x0[0] ** 2 - b[:, 0]

    nlp = nlp_from_functions(
        "mono", f, c, x0=np.full(n0 + S * ns, 0.5),
        x_lb=np.concatenate([np.full(n0, -INF), np.zeros(S * ns)]),
        x_ub=np.full(n0 + S * ns, INF),
        c_lb=np.zeros(S), c_ub=np.zeros(S))
    return uno_tpu.solve(nlp, preset="ipopt", scale_functions=False)


def test_structured_matches_monolithic():
    snlp = make_two_stage(S=4)
    res = solve_structured_ipm(snlp, tol=1e-8)
    assert res.status == "optimal", (res.status, res.kkt_error)
    mono = monolithic_solution(snlp)
    assert mono.success
    assert abs(res.objective - mono.objective) < 1e-6
    x0_mono = mono.x[: snlp.n0]
    assert np.allclose(res.x0, x0_mono, atol=1e-6)


def test_structured_scales_scenarios():
    res8 = solve_structured_ipm(make_two_stage(S=8), tol=1e-8)
    res16 = solve_structured_ipm(make_two_stage(S=16), tol=1e-8)
    assert res8.status == "optimal" and res16.status == "optimal"
    assert res8.kkt_error <= 1e-8 and res16.kkt_error <= 1e-8


def test_structured_infeasible_triggers_restoration():
    """cs = xs[0]^2 + 1 = 0 is infeasible; at xs[0]=0 the Jacobian vanishes,
    the optimality-phase KKT block is structurally singular, and the solver
    must switch to the restoration phase and certify local infeasibility
    (reference FeasibilityRestoration.cpp:91-105 behavior)."""
    S, n0, ns, m = 2, 1, 1, 1

    def f0(x0):
        return jnp.sum(x0 ** 2)

    def fs(x0, xs, p):
        return jnp.sum((xs - 1.0) ** 2)

    def cs(x0, xs, p):
        return jnp.array([xs[0] ** 2 + 1.0])

    snlp = ScenarioNLP(
        name="infeas", n0=n0, ns=ns, m=m, S=S,
        f0=f0, fs=fs, cs=cs,
        x0_lb=np.full(n0, -INF), x0_ub=np.full(n0, INF),
        xs_lb=np.full(ns, -INF), xs_ub=np.full(ns, INF),
        x0_init=np.zeros(n0), xs_init=np.zeros((S, ns)),
        params={"dummy": jnp.zeros((S, 1))},
    )
    res = solve_structured_ipm(snlp, tol=1e-8, max_iterations=100)
    assert res.status == "infeasible", (res.status, res.kkt_error)
    # restoration stationary point of 0.5||c||^2: xs[0] = 0
    assert np.all(np.abs(res.xs) < 1e-4)


def test_structured_with_bounds_active():
    # drive some xs to their lower bound 0
    snlp = make_two_stage(S=4, seed=3)
    import dataclasses
    a = np.asarray(snlp.params["a"]).copy()
    a[:, 2] = -2.0      # pulls xs[2] negative -> bound active at 0
    snlp = dataclasses.replace(snlp, params={"a": jnp.asarray(a),
                                             "b": snlp.params["b"]})
    res = solve_structured_ipm(snlp, tol=1e-8)
    assert res.status == "optimal"
    assert np.all(res.xs[:, 2] >= -1e-10)
    assert np.all(res.xs[:, 2] <= 1e-6)   # at the bound
