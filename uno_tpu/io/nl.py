"""AMPL .nl ingestion (text AND binary format): native C++ parser + JAX
postfix evaluator.

Replaces the reference's ASL bindings (bindings/AMPL/AMPLModel.cpp): the C++
library (nlread.cpp, built on first use) parses the .nl file into flat
postfix token streams; here each expression is replayed on a stack under JAX
tracing, producing pure jnp functions whose exact derivatives come from
jax AD — no hand-coded sparsity or derivative code (ASL's Sphes/Congrd
machinery becomes jax.jacfwd/jax.hessian inside the solver).

Usage:
    nlp = read_nl("problem.nl")
    result = uno_tpu.solve(nlp, preset="ipopt")
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from uno_tpu.model.nlp import NLP, INF

_HERE = Path(__file__).parent
_LIB = None


class _NLData(ctypes.Structure):
    _fields_ = [
        ("n_vars", ctypes.c_int32), ("n_cons", ctypes.c_int32),
        ("n_objs", ctypes.c_int32), ("n_defined", ctypes.c_int32),
        ("objective_sense", ctypes.c_int32),
        ("x_lb", ctypes.POINTER(ctypes.c_double)),
        ("x_ub", ctypes.POINTER(ctypes.c_double)),
        ("c_lb", ctypes.POINTER(ctypes.c_double)),
        ("c_ub", ctypes.POINTER(ctypes.c_double)),
        ("x0", ctypes.POINTER(ctypes.c_double)),
        ("y0", ctypes.POINTER(ctypes.c_double)),
        ("jac_nnz", ctypes.c_int32),
        ("jac_row", ctypes.POINTER(ctypes.c_int32)),
        ("jac_col", ctypes.POINTER(ctypes.c_int32)),
        ("jac_val", ctypes.POINTER(ctypes.c_double)),
        ("grad_nnz", ctypes.c_int32),
        ("grad_col", ctypes.POINTER(ctypes.c_int32)),
        ("grad_val", ctypes.POINTER(ctypes.c_double)),
        ("n_tokens", ctypes.c_int32),
        ("tok_op", ctypes.POINTER(ctypes.c_int32)),
        ("tok_num", ctypes.POINTER(ctypes.c_double)),
        ("con_expr_off", ctypes.POINTER(ctypes.c_int32)),
        ("obj_expr_off", ctypes.POINTER(ctypes.c_int32)),
        ("def_expr_off", ctypes.POINTER(ctypes.c_int32)),
        ("def_index", ctypes.POINTER(ctypes.c_int32)),
        ("deflin_nnz", ctypes.c_int32),
        ("deflin_def", ctypes.POINTER(ctypes.c_int32)),
        ("deflin_col", ctypes.POINTER(ctypes.c_int32)),
        ("deflin_val", ctypes.POINTER(ctypes.c_double)),
        ("error", ctypes.c_char * 512),
    ]


def _build_library() -> Path:
    so = _HERE / "libnlread.so"
    src = _HERE / "nlread.cpp"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(so), str(src)],
            check=True, capture_output=True)
    return so


def _lib():
    global _LIB
    if _LIB is None:
        so = _build_library()
        _LIB = ctypes.CDLL(str(so))
        _LIB.nl_parse.restype = ctypes.POINTER(_NLData)
        _LIB.nl_parse.argtypes = [ctypes.c_char_p]
        _LIB.nl_free.argtypes = [ctypes.POINTER(_NLData)]
        _LIB.nl_to_binary.restype = ctypes.c_int
        _LIB.nl_to_binary.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                      ctypes.c_char_p, ctypes.c_int]
    return _LIB


def convert_nl_to_binary(src: str, dst: str) -> None:
    """Transcribe a text-format .nl file into binary format ('b' header,
    native-endian 4-byte ints / 8-byte doubles, arith kind on header line 6).
    read_nl() accepts either format transparently."""
    buf = ctypes.create_string_buffer(512)
    rc = _lib().nl_to_binary(os.fspath(src).encode(), os.fspath(dst).encode(),
                             buf, 512)
    if rc:
        raise ValueError(f"nl_to_binary failed: {buf.value.decode()}")


def _arr(ptr, n, dtype=np.float64):
    if n == 0:
        return np.zeros(0, dtype=dtype)
    ctype = ctypes.c_double if dtype == np.float64 else ctypes.c_int32
    return np.ctypeslib.as_array(ctypes.cast(ptr, ctypes.POINTER(ctype)),
                                 shape=(n,)).astype(dtype).copy()


# ---------------------------------------------------------------------------
# postfix stack evaluation under JAX tracing (ASL opcode subset)
# ---------------------------------------------------------------------------

_UNARY = {
    13: jnp.floor, 14: jnp.ceil, 15: jnp.abs, 16: lambda a: -a,
    37: jnp.tanh, 38: jnp.tan, 39: jnp.sqrt, 40: jnp.sinh, 41: jnp.sin,
    42: lambda a: jnp.log10(a), 43: jnp.log, 44: jnp.exp, 45: jnp.cosh,
    46: jnp.cos, 47: jnp.arctanh, 49: jnp.arctan, 50: jnp.arcsinh,
    51: jnp.arcsin, 52: jnp.arccosh, 53: jnp.arccos,
    77: lambda a: a * a,
}

def _pow(a, b):
    # concrete integral exponents take the exact integer-power path
    # (repeated multiplication); XLA's float pow is exp(b log a) with ~1e-9
    # relative error and NaN for negative bases — x^4 on x<0 must work
    if isinstance(b, (int, float, np.integer, np.floating)) \
            and float(b).is_integer() and abs(float(b)) <= 64:
        return a ** int(b)
    return a ** b


_BINARY = {
    0: lambda a, b: a + b,
    1: lambda a, b: a - b,
    2: lambda a, b: a * b,
    3: lambda a, b: a / b,
    4: lambda a, b: a - jnp.trunc(a / b) * b,   # rem
    5: _pow,
    6: lambda a, b: jnp.maximum(a - b, 0.0),    # less
    48: lambda a, b: jnp.arctan2(a, b),
    55: lambda a, b: jnp.trunc(a / b),          # int div
}


def _eval_postfix(ops, nums, x, defined):
    """Replay a postfix program on a Python stack; traced values become jnp
    expressions."""
    stack = []
    i = 0
    n = len(ops)
    while i < n:
        op = int(ops[i])
        v = nums[i]
        if op == -1:
            stack.append(v)
        elif op == -2:
            idx = int(v)
            stack.append(x[idx] if idx < x.shape[0] else defined[idx])
        elif op in _UNARY:
            stack.append(_UNARY[op](stack.pop()))
        elif op in _BINARY:
            b = stack.pop()
            a = stack.pop()
            stack.append(_BINARY[op](a, b))
        elif op == 76:   # OP1POW: base ** const; const is embedded as prior token
            # ASL writes o76 with the exponent inside the node; the text
            # format emits it as binary pow in practice — treat as unary noop
            raise ValueError("unexpected OP1POW in text .nl")
        elif op in (11, 12, 54):   # MINLIST / MAXLIST / OPSUMLIST
            k = int(v)
            args = [stack.pop() for _ in range(k)][::-1]
            if op == 54:
                acc = args[0]
                for a in args[1:]:
                    acc = acc + a
            elif op == 11:
                acc = args[0]
                for a in args[1:]:
                    acc = jnp.minimum(acc, a)
            else:
                acc = args[0]
                for a in args[1:]:
                    acc = jnp.maximum(acc, a)
            stack.append(acc)
        elif op == 35:   # if-then-else (condition is a comparison expr)
            else_v = stack.pop()
            then_v = stack.pop()
            cond = stack.pop()
            stack.append(jnp.where(cond, then_v, else_v))
        elif op in (20, 21, 22, 23, 24, 28, 29, 30, 34):
            # logical ops appear only inside OPIFnl conditions
            b = stack.pop() if op != 34 else None
            a = stack.pop()
            table = {20: lambda p, q: p | q, 21: lambda p, q: p & q,
                     22: lambda p, q: p < q, 23: lambda p, q: p <= q,
                     24: lambda p, q: p == q, 28: lambda p, q: p >= q,
                     29: lambda p, q: p > q, 30: lambda p, q: p != q}
            stack.append(~a if op == 34 else table[op](a, b))
        else:
            raise ValueError(f"unsupported ASL opcode {op}")
        i += 1
    if len(stack) != 1:
        raise ValueError(f"malformed postfix program (stack depth {len(stack)})")
    return stack[0]


def read_nl(path: str, name: str | None = None) -> NLP:
    """Parse a .nl file into an NLP with JAX-traceable f and c."""
    lib = _lib()
    dptr = lib.nl_parse(os.fspath(path).encode())
    d = dptr.contents
    try:
        err = bytes(d.error).split(b"\0")[0].decode()
        if err:
            raise ValueError(f"failed to parse {path}: {err}")
        nv, nc = int(d.n_vars), int(d.n_cons)
        nd = int(d.n_defined)
        x_lb = _arr(d.x_lb, nv)
        x_ub = _arr(d.x_ub, nv)
        c_lb = _arr(d.c_lb, nc)
        c_ub = _arr(d.c_ub, nc)
        x0 = _arr(d.x0, nv)
        y0 = _arr(d.y0, nc)
        sense = int(d.objective_sense)

        ntok = int(d.n_tokens)
        ops = _arr(d.tok_op, ntok, np.int32)
        nums = _arr(d.tok_num, ntok)
        con_off = _arr(d.con_expr_off, nc + 1, np.int32)
        obj_off = _arr(d.obj_expr_off, 2, np.int32)
        def_off = _arr(d.def_expr_off, nd + 1, np.int32)
        def_index = _arr(d.def_index, nd, np.int32)
        jac = (_arr(d.jac_row, d.jac_nnz, np.int32),
               _arr(d.jac_col, d.jac_nnz, np.int32),
               _arr(d.jac_val, d.jac_nnz))
        grad = (_arr(d.grad_col, d.grad_nnz, np.int32),
                _arr(d.grad_val, d.grad_nnz))
        deflin = (_arr(d.deflin_def, d.deflin_nnz, np.int32),
                  _arr(d.deflin_col, d.deflin_nnz, np.int32),
                  _arr(d.deflin_val, d.deflin_nnz))
    finally:
        lib.nl_free(dptr)

    def eval_defined(x):
        """Defined (common-expression) variables, in definition order."""
        defined = {}
        for k in range(nd):
            seg = slice(int(def_off[k]), int(def_off[k + 1]))
            val = _eval_postfix(ops[seg], nums[seg], x, defined)
            for dd, col, cv in zip(*deflin):
                if dd == k:
                    val = val + cv * x[int(col)]
            defined[int(def_index[k])] = val
        return defined

    def f(x, params=None):
        defined = eval_defined(x)
        seg = slice(int(obj_off[0]), int(obj_off[1]))
        val = _eval_postfix(ops[seg], nums[seg], x, defined) if seg.stop > seg.start \
            else jnp.asarray(0.0, dtype=x.dtype)
        gcols, gvals = grad
        for col, cv in zip(gcols, gvals):
            val = val + cv * x[int(col)]
        return -val if sense else val

    def c(x, params=None):
        defined = eval_defined(x)
        out = []
        jrows, jcols, jvals = jac
        for i in range(nc):
            seg = slice(int(con_off[i]), int(con_off[i + 1]))
            val = _eval_postfix(ops[seg], nums[seg], x, defined) if seg.stop > seg.start \
                else jnp.asarray(0.0, dtype=x.dtype)
            out.append(val)
        if len(jvals):
            lin = jnp.zeros(nc, dtype=x.dtype).at[jnp.asarray(jrows)].add(
                jnp.asarray(jvals) * x[jnp.asarray(jcols)])
            return jnp.stack(out) + lin
        return jnp.stack(out) if nc else jnp.zeros((0,), dtype=x.dtype)

    prob_name = name or Path(path).stem
    return NLP(
        name=prob_name, n=nv, m=nc, f=f, c=c,
        x_lb=x_lb, x_ub=x_ub, c_lb=c_lb, c_ub=c_ub,
        x0=x0, y0=y0, params=None,
    )
