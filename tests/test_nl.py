"""AMPL .nl ingestion tests against the reference's example fixtures
(/root/reference/examples/*.nl, the same fixtures its CI uses)."""

import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import uno_tpu
from uno_tpu.io import read_nl, convert_nl_to_binary
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
    bad.write_text("q3 1 1 0\n")  # neither text ('g') nor binary ('b')
    with pytest.raises(ValueError, match="must begin with"):
        read_nl(bad)


def test_nl_missing_file(tmp_path):
    with pytest.raises(ValueError, match="cannot open"):
        read_nl(tmp_path / "nope.nl")


# ---------------------------------------------------------------------------
# binary .nl format (ASL 'b' files: ASCII header, binary numeric fields)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["hs015", "polak5"])
def test_binary_nl_roundtrip(name, tmp_path):
    """text → binary transcription must read back to the identical model."""
    src = FIXTURES / f"{name}.nl"
    dst = tmp_path / f"{name}_bin.nl"
    convert_nl_to_binary(src, dst)
    assert dst.read_bytes()[:1] == b"b"
    a = read_nl(src)
    b = read_nl(dst)
    assert a.n == b.n and a.m == b.m
    for fld in ("x_lb", "x_ub", "c_lb", "c_ub", "x0", "y0"):
        assert np.array_equal(np.asarray(getattr(a, fld)),
                              np.asarray(getattr(b, fld)), equal_nan=True)
    rng = np.random.default_rng(7)
    for _ in range(5):
        x = jnp.asarray(rng.uniform(-2, 2, a.n))
        assert float(a.objective(x)) == float(b.objective(x))  # bit-identical
        assert np.array_equal(np.asarray(a.constraints(x)),
                              np.asarray(b.constraints(x)))


def test_solve_from_binary_nl(tmp_path):
    dst = tmp_path / "hs015b.nl"
    convert_nl_to_binary(FIXTURES / "hs015.nl", dst)
    res = uno_tpu.solve(read_nl(dst), preset="ipopt")
    assert res.success
    assert abs(res.objective - 306.5) < 1e-3


def test_binary_nl_byteswap(tmp_path):
    """A byte-swapped binary file (opposite arith kind) must read the same."""
    src = FIXTURES / "hs015.nl"
    little = tmp_path / "little.nl"
    convert_nl_to_binary(src, little)
    data = bytearray(little.read_bytes())
    # split header (10 ASCII lines) from the binary body
    idx = 0
    for _ in range(10):
        idx = data.index(b"\n", idx) + 1
    header = data[:idx].decode()
    lines = header.splitlines(keepends=True)
    assert " 1 " in lines[5] or lines[5].split()[2] == "1"
    fields = lines[5].split()
    fields[2] = "2"  # declare big-endian
    lines[5] = " " + " ".join(fields) + "\n"
    swapped = bytearray("".join(lines).encode())
    # re-encode the body with every numeric field byte-reversed by replaying
    # the token structure: reuse the reader on the original file to learn the
    # layout is too circular — instead transcode via struct on a copy of the
    # body produced by walking it with the known hs015 structure is fragile.
    # Simplest faithful check: byte-swap is exercised by swapping each field
    # of the body; the body for hs015 is a deterministic token stream, so
    # walk it generically: segment letters are ASCII, ints 4B, doubles 8B.
    body = bytes(data[idx:])
    swapped += _swap_binary_body(body)
    out = tmp_path / "big.nl"
    out.write_bytes(bytes(swapped))
    a = read_nl(src)
    b = read_nl(out)
    x = jnp.asarray(np.array([-1.3, 0.7]))
    assert float(a.objective(x)) == float(b.objective(x))
    assert np.array_equal(np.asarray(a.x_lb), np.asarray(b.x_lb), equal_nan=True)


def _swap_binary_body(body: bytes) -> bytes:
    """Byte-swap every numeric field of a binary .nl body (test helper).

    Walks the same grammar the C++ reader implements: segment letters and
    expression-node type chars are single ASCII bytes; ints are 4 bytes,
    doubles 8 bytes; bound codes are ASCII digits."""
    import struct
    out = bytearray()
    i = 0
    n = len(body)

    def swap(k):
        nonlocal i
        out.extend(body[i:i + k][::-1])
        i += k

    def rd_int():
        nonlocal i
        v = struct.unpack("<i", body[i:i + 4])[0]
        swap(4)
        return v

    def walk_expr():
        nonlocal i
        t = body[i:i + 1]
        out.extend(t)
        i += 1
        if t == b"n":
            swap(8)
        elif t == b"v":
            rd_int()
        elif t == b"s":
            swap(2)
        elif t == b"l":
            rd_int()
        elif t == b"o":
            op = rd_int()
            unary = {13, 14, 15, 16, 34, 37, 38, 39, 40, 41, 42, 43, 44, 45,
                     46, 47, 49, 50, 51, 52, 53, 76, 77, 78}
            binary = {0, 1, 2, 3, 4, 5, 6, 20, 21, 22, 23, 24, 28, 29, 30,
                      48, 55}
            if op in unary:
                walk_expr()
            elif op in binary:
                walk_expr()
                walk_expr()
            elif op == 35:
                walk_expr(); walk_expr(); walk_expr()
            elif op in (11, 12, 54):
                cnt = rd_int()
                for _ in range(cnt):
                    walk_expr()
            else:
                raise ValueError(f"unexpected opcode {op}")
        else:
            raise ValueError(f"unexpected expr byte {t!r}")

    # hs015: 2 vars, 2 cons (known to the fixture; generic walk needs counts)
    NV, NC = 2, 2
    while i < n:
        seg = body[i:i + 1]
        out.extend(seg)
        i += 1
        if seg == b"C":
            rd_int()
            walk_expr()
        elif seg == b"O":
            rd_int(); rd_int()
            walk_expr()
        elif seg in (b"x", b"d"):
            cnt = rd_int()
            for _ in range(cnt):
                rd_int(); swap(8)
        elif seg == b"r":
            for _ in range(NC):
                code = body[i:i + 1]
                out.extend(code); i += 1
                k = int(code)
                swap(8) if k in (1, 2, 4) else None
                if k == 0:
                    swap(8); swap(8)
        elif seg == b"b":
            for _ in range(NV):
                code = body[i:i + 1]
                out.extend(code); i += 1
                k = int(code)
                if k == 0:
                    swap(8); swap(8)
                elif k in (1, 2, 4):
                    swap(8)
        elif seg == b"k":
            cnt = rd_int()
            for _ in range(cnt):
                rd_int()
        elif seg in (b"J", b"G"):
            rd_int()
            cnt = rd_int()
            for _ in range(cnt):
                rd_int(); swap(8)
        else:
            raise ValueError(f"unexpected segment {seg!r}")
    return bytes(out)


# ---------------------------------------------------------------------------
# generated scalable fixtures (tests/fixtures/nl, tools/gen_nl_fixtures.py):
# the ASL-replacement path exercised at scale (text AND binary formats)
# ---------------------------------------------------------------------------

LOCAL_FIXTURES = Path(__file__).parent / "fixtures" / "nl"
_GEN = sorted(p.name[:-3] for p in LOCAL_FIXTURES.glob("*.nl")
              if not p.name.endswith(".bin.nl")) if LOCAL_FIXTURES.exists() else []


@pytest.mark.parametrize("stem", _GEN)
def test_generated_fixture_text_binary_agree(stem):
    nl_t = read_nl(LOCAL_FIXTURES / f"{stem}.nl")
    nl_b = read_nl(LOCAL_FIXTURES / f"{stem}.bin.nl")
    assert nl_t.n == nl_b.n and nl_t.m == nl_b.m
    rng = np.random.default_rng(7)
    for _ in range(3):
        x = jnp.asarray(rng.uniform(-1.5, 1.5, nl_t.n))
        assert np.isclose(float(nl_t.objective(x)), float(nl_b.objective(x)),
                          rtol=1e-14)
        if nl_t.m:
            assert np.allclose(np.asarray(nl_t.constraints(x)),
                               np.asarray(nl_b.constraints(x)), rtol=1e-14)


@pytest.mark.parametrize("fam,n", [("srosenbr", 10), ("lukvle1", 10),
                                   ("sphere_proj", 10), ("catena", 8)])
def test_generated_fixture_matches_library(fam, n):
    """The .nl expression graph evaluates identically to the analytic
    library builder of the same family."""
    from uno_tpu.model import library_cutest as lc

    nl = read_nl(LOCAL_FIXTURES / f"{fam}_n{n}.nl")
    # catena fixtures are named by joint-variable count nv = 2(K-1) with
    # K = n_request // 2: the n8 fixture corresponds to a size-10 request
    ref = lc.cutest_problem(fam, n if fam != "catena" else 10)
    assert nl.n == ref.n and nl.m == ref.m
    rng = np.random.default_rng(3)
    for _ in range(4):
        x = jnp.asarray(rng.uniform(-1, 1, nl.n))
        assert np.isclose(float(nl.objective(x)), float(ref.objective(x)),
                          rtol=1e-11), fam
        if nl.m:
            assert np.allclose(np.asarray(nl.constraints(x)),
                               np.asarray(ref.constraints(x)), rtol=1e-11)


def test_solve_generated_fixture_e2e():
    nl = read_nl(LOCAL_FIXTURES / "chained_rosenbrock_n10.nl")
    res = uno_tpu.solve(nl, preset="ipopt")
    assert res.success
    assert res.objective < 1e-8  # f* = 0 at x = 1 (feasible: ||1||^2 = n)
