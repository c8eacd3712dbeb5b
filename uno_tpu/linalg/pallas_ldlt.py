"""Pallas TPU kernel: blocked symmetric-indefinite LDL^T factorization.

The MA57-class factorization (reference MA57Solver.cpp / MUMPSSolver.cpp
role) for LARGE dense KKT systems.  The XLA `ldlt_factor_blocked` pays an
HBM round-trip plus dynamic-update-slice per column step (profiled ~5.4 ms
at n=1024, ~66 GF/s); this kernel keeps the whole matrix resident in VMEM
across the factorization and needs no per-column transposes or relayouts.

Layout trick: the working matrix stays SYMMETRIC in its trailing block, so
the panel can be processed in TRANSPOSED orientation (rows of M instead of
columns of M) and both orientations of each elimination vector are read with
cheap one-hot contractions:
  * row orientation  l_row (1, n):   one-hot over the panel's sublanes
  * col orientation  l_col (block,1): one-hot over lane kb+j — equal to the
    row entries by symmetry of the (block, block) diagonal sub-block, which
    rank-1 updates preserve
The per-column work is then 4 VPU passes over the (block, n) panel with no
cross-layout moves; the trailing update is one MXU matmul per panel.

Unpivoted, same numerics as `ldlt_factor_blocked` (the primal-dual
inertia-correction loop upstream repairs indefinite/singular pivots — see
linalg/ldlt.py for the design rationale).

Capacity (round 3): the factorization works IN PLACE in the output
buffer (processed panel rows become the L^T rows; the trailing update
touches only the unprocessed block), so VMEM holds 2*n^2*4 bytes (input +
working/output) -> n <= 1280 (padded).  Larger systems fall back to the
XLA blocked factorization or, for structured models, the banded
block-tridiagonal/cyclic-reduction path (linalg/banded.py).

Batched variant (round 5): `ldlt_factor_pallas_batched` runs the same
kernel with the BATCH as the Pallas grid axis (one instance per step,
HBM->VMEM transfers pipelined against compute).  jax.vmap of the
single-instance kernel does not lower in Mosaic; the measured crossover vs
the vmapped XLA blocked path on v5e is dim ~512 (1.3x at dim 640) — below
that the XLA path wins because both implementations are bound by the same
serial column chain and XLA amortizes each column across every batch lane
at once.  Two further layouts were built and MEASURED against this
(BASELINE.md round-5 note): an instances-on-sublane kernel (per-column
work vectorized across a b_tile of instances, layout (rows, b_tile, cols))
reached only 0.82x of XLA at dim 132 (128-lane padding plus sublane-slice
relayouts in the trailing update eat the gain), and a
b_tile-instances-per-grid-step variant of this kernel tripped Mosaic's
(b, 1, 1) scalar-broadcast layout check — the per-instance grid is what
ships.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from uno_tpu.linalg.ldlt import LDLT, _inertia, _safe

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

PALLAS_MAX_DIM = 1280


def _ldlt_kernel(a_ref, lt_ref, d_ref, *, n: int, block: int):
    """Factor a_ref (n, n) -> lt_ref holds L^T (unit diagonal implied),
    d_ref (1, n) the pivots.  lt_ref doubles as the working copy: the
    processed panel rows are overwritten with L^T rows while the trailing
    update only touches the not-yet-processed block, so no separate
    scratch is needed (extends the VMEM window to n = 1280)."""
    nblocks = n // block
    lt_ref[:] = a_ref[:]
    lane_ids = lax.broadcasted_iota(jnp.int32, (1, n), 1)        # lanes
    sub_ids = lax.broadcasted_iota(jnp.int32, (block, 1), 0)     # sublanes

    for k in range(nblocks):            # static unroll over panels
        kb = k * block
        pt0 = lt_ref[kb:kb + block, :]                    # (block, n) panel^T
        dpan0 = jnp.zeros((1, block), dtype=pt0.dtype)

        def col_step(jj, carry):
            pt, dpan = carry
            j = kb + jj
            # pivot: element (jj, kb+jj); maintained via the dpan vector is
            # avoidable — extract directly with a 2-level one-hot (cheap)
            dj = jnp.sum(jnp.where((sub_ids == jj) & (lane_ids == j), pt, 0.0))
            inv = 1.0 / _safe(dj)
            # row orientation: full L column (as a row), entries > j
            l_row = jnp.sum(jnp.where(sub_ids == jj, pt, 0.0), axis=0,
                            keepdims=True)               # (1, n)
            l_row = jnp.where(lane_ids > j, l_row * inv, 0.0)
            # col orientation within the panel: lane kb+jj across sublanes
            # (equals the row entries by symmetry of the diagonal sub-block)
            l_col = jnp.sum(jnp.where(lane_ids == j, pt, 0.0), axis=1,
                            keepdims=True)               # (block, 1)
            l_col = jnp.where(sub_ids > jj, l_col * inv, 0.0)
            # rank-1 update of the remaining panel rows (VPU)
            pt = pt - dj * (l_col * l_row)
            # commit row jj of L^T and the pivot
            pt = jnp.where(sub_ids == jj, l_row, pt)
            dpan = jnp.where(
                lax.broadcasted_iota(jnp.int32, (1, block), 1) == jj, dj, dpan)
            return pt, dpan

        # i32 loop bounds: under jax_enable_x64 a python-int bound makes
        # the induction variable i64, which Mosaic cannot convert/compare.
        # (A static unroll of the column loop was tried and rejected: it
        # does not beat the loop — the serial scalar extraction latency
        # dominates either way — and overflows the compiler at n=1024.)
        pt, dpan = lax.fori_loop(jnp.int32(0), jnp.int32(block), col_step,
                                 (pt0, dpan0))
        lt_ref[kb:kb + block, :] = pt
        d_ref[:, kb:kb + block] = dpan

        rest = n - (kb + block)
        if rest:
            # trailing update on the MXU, symmetric (rest, rest) block:
            # T -= (P^T)^T_scaled-contraction: contract the block axis
            ptr = pt[:, kb + block:]                     # (block, rest)
            # dpan as a column without a relayout: one-hot matmul-free
            dcol = jnp.sum(
                jnp.where(lax.broadcasted_iota(jnp.int32, (block, block), 1)
                          == sub_ids, dpan, 0.0), axis=1, keepdims=True)
            t = lt_ref[kb + block:, kb + block:]         # (rest, rest)
            lt_ref[kb + block:, kb + block:] = t - lax.dot_general(
                ptr, ptr * dcol, (((0,), (0,)), ((), ())),
                preferred_element_type=t.dtype)


def _ldlt_kernel_batched(a_ref, lt_ref, d_ref, *, n: int, block: int):
    """One grid step factors ONE batch instance; refs are (1, n, n)/(1, 1, n)
    VMEM blocks selected by the batch grid index.  Same algorithm as
    `_ldlt_kernel`."""
    nblocks = n // block
    lt_ref[0] = a_ref[0]
    lane_ids = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    sub_ids = lax.broadcasted_iota(jnp.int32, (block, 1), 0)

    for k in range(nblocks):
        kb = k * block
        pt0 = lt_ref[0, kb:kb + block, :]
        dpan0 = jnp.zeros((1, block), dtype=pt0.dtype)

        def col_step(jj, carry):
            pt, dpan = carry
            j = kb + jj
            dj = jnp.sum(jnp.where((sub_ids == jj) & (lane_ids == j), pt, 0.0))
            inv = 1.0 / _safe(dj)
            l_row = jnp.sum(jnp.where(sub_ids == jj, pt, 0.0), axis=0,
                            keepdims=True)
            l_row = jnp.where(lane_ids > j, l_row * inv, 0.0)
            l_col = jnp.sum(jnp.where(lane_ids == j, pt, 0.0), axis=1,
                            keepdims=True)
            l_col = jnp.where(sub_ids > jj, l_col * inv, 0.0)
            pt = pt - dj * (l_col * l_row)
            pt = jnp.where(sub_ids == jj, l_row, pt)
            dpan = jnp.where(
                lax.broadcasted_iota(jnp.int32, (1, block), 1) == jj, dj, dpan)
            return pt, dpan

        pt, dpan = lax.fori_loop(jnp.int32(0), jnp.int32(block), col_step,
                                 (pt0, dpan0))
        lt_ref[0, kb:kb + block, :] = pt
        d_ref[0, :, kb:kb + block] = dpan

        rest = n - (kb + block)
        if rest:
            ptr = pt[:, kb + block:]
            dcol = jnp.sum(
                jnp.where(lax.broadcasted_iota(jnp.int32, (block, block), 1)
                          == sub_ids, dpan, 0.0), axis=1, keepdims=True)
            t = lt_ref[0, kb + block:, kb + block:]
            lt_ref[0, kb + block:, kb + block:] = t - lax.dot_general(
                ptr, ptr * dcol, (((0,), (0,)), ((), ())),
                preferred_element_type=t.dtype)


def _bmap(b):
    # index maps return (b, z, z) with z typed like b: plain python-0
    # literals trace to i64 under jax_enable_x64 and Mosaic refuses the
    # mixed (i32, i64, i64) index tuple
    z = jnp.zeros((), dtype=b.dtype) if hasattr(b, "dtype") else 0
    return (b, z, z)


@partial(jax.jit, static_argnames=("block", "zero_pivot_rtol", "interpret"))
def ldlt_factor_pallas_batched(A: jnp.ndarray, block: int = 32,
                               zero_pivot_rtol: float = 1e-32,
                               interpret: bool = False) -> LDLT:
    """Batched Pallas LDL^T: A is (B, n, n); the batch is the Pallas grid
    axis (one instance per grid step), so Mosaic pipelines each instance's
    HBM->VMEM transfer against the previous instance's compute.  Same
    padding/inertia contract as the single-instance kernel."""
    B0, n0 = A.shape[0], A.shape[-1]
    dtype = A.dtype
    unit = max(block, 128)
    n = -(-max(n0, 1) // unit) * unit
    pad = n - n0
    if pad:
        A = jnp.pad(A, ((0, 0), (0, pad), (0, pad)))
        A = A.at[:, jnp.arange(n0, n), jnp.arange(n0, n)].set(1.0)

    LT, d2 = pl.pallas_call(
        partial(_ldlt_kernel_batched, n=n, block=block),
        grid=(B0,),
        out_shape=(
            jax.ShapeDtypeStruct((B0, n, n), dtype),
            jax.ShapeDtypeStruct((B0, 1, n), dtype),
        ),
        in_specs=[pl.BlockSpec((1, n, n), _bmap, memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, n, n), _bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), _bmap, memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(A)
    d = d2[:, 0, :n0]
    eye = jnp.eye(n, dtype=dtype)
    L = jnp.triu(LT, 1).transpose(0, 2, 1) + eye
    L = L[:, :n0, :n0]
    pos, neg, zero = jax.vmap(partial(_inertia,
                                      zero_pivot_rtol=zero_pivot_rtol))(d)
    return LDLT(L, d, pos, neg, zero)


@partial(jax.jit, static_argnames=("block", "zero_pivot_rtol", "interpret"))
def ldlt_factor_pallas(A: jnp.ndarray, block: int = 32,
                       zero_pivot_rtol: float = 1e-32,
                       interpret: bool = False) -> LDLT:
    """Pallas blocked LDL^T; same contract as `ldlt_factor_blocked`.

    The matrix is padded to a multiple of `block` (and at least one VPU
    lane tile) with a +1 identity tail whose known-positive pivots are
    removed from the reported inertia."""
    n0 = A.shape[-1]
    dtype = A.dtype
    unit = max(block, 128)
    n = -(-max(n0, 1) // unit) * unit
    pad = n - n0
    if pad:
        A = jnp.pad(A, ((0, pad), (0, pad)))
        A = A.at[jnp.arange(n0, n), jnp.arange(n0, n)].set(1.0)

    LT, d2 = pl.pallas_call(
        partial(_ldlt_kernel, n=n, block=block),
        out_shape=(
            jax.ShapeDtypeStruct((n, n), dtype),
            jax.ShapeDtypeStruct((1, n), dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(A)
    d = d2[0]

    L = jnp.triu(LT, 1).T + jnp.eye(n, dtype=dtype)
    L = L[:n0, :n0]
    d = d[:n0]
    pos, neg, zero = _inertia(d, zero_pivot_rtol)
    return LDLT(L, d, pos, neg, zero)
