"""AMPL .nl ingestion tests against the reference's example fixtures
(/root/reference/examples/*.nl, the same fixtures its CI uses)."""

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import uno_tpu
from uno_tpu.io import read_nl
from uno_tpu.model.library import get_problem

FIXTURES = Path("/root/reference/examples")

pytestmark = pytest.mark.skipif(not FIXTURES.exists(),
                                reason="reference fixtures not available")


@pytest.mark.parametrize("name", ["hs015", "polak5"])
def test_nl_matches_handwritten_model(name):
    nl = read_nl(FIXTURES / f"{name}.nl")
    ref = get_problem(name)
    assert nl.n == ref.n and nl.m == ref.m
    assert np.allclose(nl.x0, ref.x0)
    assert np.allclose(np.nan_to_num(nl.x_lb, neginf=-9e9),
                       np.nan_to_num(ref.x_lb, neginf=-9e9))
    assert np.allclose(np.nan_to_num(nl.c_ub, posinf=9e9),
                       np.nan_to_num(ref.c_ub, posinf=9e9))
    rng = np.random.default_rng(1)
    for _ in range(5):
        x = jnp.asarray(rng.uniform(-2, 2, nl.n))
        assert np.isclose(float(nl.objective(x)), float(ref.objective(x)), rtol=1e-12)
        assert np.allclose(np.asarray(nl.constraints(x)),
                           np.asarray(ref.constraints(x)), rtol=1e-12)


def test_nl_derivatives_through_ad():
    nl = read_nl(FIXTURES / "hs015.nl")
    x = jnp.array([-2.0, 1.0])
    g = np.asarray(nl.objective_gradient(x))
    assert np.allclose(g, [-2406.0, -600.0])  # hand-computed
    J = np.asarray(nl.constraint_jacobian(x))
    assert np.allclose(J, [[1.0, -2.0], [1.0, 2.0]])


def test_solve_from_nl():
    nl = read_nl(FIXTURES / "hs015.nl")
    res = uno_tpu.solve(nl, preset="ipopt")
    assert res.success
    assert abs(res.objective - 306.5) < 1e-3


def test_nl_parse_error_is_clean(tmp_path):
    bad = tmp_path / "bad.nl"
    bad.write_text("b3 1 1 0\n")  # binary format marker
    with pytest.raises(ValueError, match="text-format"):
        read_nl(bad)


def test_nl_missing_file(tmp_path):
    with pytest.raises(ValueError, match="cannot open"):
        read_nl(tmp_path / "nope.nl")
