"""Banded symmetric linear algebra: block-tridiagonal Cholesky on the MXU.

TPU-native replacement for the *sparse multifrontal* capability class of the
reference's MA27/MA57/MUMPS solvers (MA57Solver.cpp:40-90 symbolic analysis,
MUMPSSolver.cpp:60-123): instead of elimination trees over general sparsity,
the structured path targets the dominant CUTEst-large structure — banded
Lagrangian Hessians (chained sums, discretized 1-D/2-D operators, optimal
control staircases) — and factorizes them as a BLOCK-TRIDIAGONAL Cholesky:

    A (half-bandwidth b, dim n)  ->  blocks of size nb >= b
    A = [D_0  E_0^T           ]      scan over N = n/nb block steps,
        [E_0  D_1   E_1^T     ]      each step: one nb x nb Cholesky,
        [      E_1  D_2   ... ]      one triangular solve, one matmul
                                     — all dense MXU ops, O(n*nb^2) FLOPs
                                     and O(n*nb) memory vs dense O(n^3)/O(n^2).

Positive definiteness doubles as the inertia test (same contract as the
lifted/condensed backend, linalg/condensed.py): a failed Cholesky (NaN
diagonal) reports wrong inertia and drives the delta-bump regularization
loop (ingredients/regularization.py).

Band storage is LOWER band-major: band[d, j] = A[j + d, j] for d in [0, b];
columns beyond n are zero-padded to N*nb (padded diagonal set to 1 so the
factorization stays PD).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def pick_block_size(bandwidth: int) -> int:
    """Smallest TPU-friendly (multiple-of-8) block STRICTLY greater than the
    half-bandwidth, as band_to_blocks requires."""
    return (int(bandwidth) // 8 + 1) * 8


def band_matvec(band: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Symmetric banded matvec.  band (b+1, n) lower storage, v (n,)."""
    b = band.shape[0] - 1
    n = band.shape[1]
    out = band[0] * v
    for d in range(1, b + 1):
        # A[j+d, j] couples v[j] -> out[j+d] and v[j+d] -> out[j]
        lo = band[d, : n - d]
        out = out.at[d:].add(lo * v[: n - d])
        out = out.at[: n - d].add(lo * v[d:])
    return out


class BTDFactor(NamedTuple):
    """Block-tridiagonal Cholesky factor.

    L:  (N, nb, nb) lower-triangular diagonal blocks
    Ct: (N, nb, nb) with Ct[i] = L_i^{-1} E_i^T (the transposed
        subdiagonal factor; Ct[N-1] is zero)
    num_pos/num_neg/num_zero: inertia contract for regularize_and_factor
    """
    L: jnp.ndarray
    Ct: jnp.ndarray
    num_pos: jnp.ndarray
    num_neg: jnp.ndarray
    num_zero: jnp.ndarray


def band_to_blocks(band: jnp.ndarray, nb: int):
    """(b+1, n) lower band -> (D, E): (N, nb, nb) diagonal blocks and
    (N, nb, nb) subdiagonal blocks (E[i] = A[(i+1)nb:(i+2)nb, i*nb:(i+1)nb];
    E[N-1] is zero).  Zero-padded columns get unit diagonal."""
    b = band.shape[0] - 1
    n = band.shape[1]
    assert b < nb, f"bandwidth {b} must be < block size {nb}"
    N = -(-n // nb)
    n_pad = N * nb
    pad = jnp.zeros((b + 1, n_pad - n), dtype=band.dtype)
    if n_pad > n:
        pad = pad.at[0, :].set(1.0)
    bandp = jnp.concatenate([band, pad], axis=1)

    # gather D[i][r, c]: for r >= c it is band[r-c, i*nb+c] (r-c <= b)
    r = np.arange(nb)[:, None]
    c = np.arange(nb)[None, :]
    d_off = r - c                      # (nb, nb), lower part in [0, b]
    lower_ok = (d_off >= 0) & (d_off <= b)
    d_idx = np.where(lower_ok, d_off, 0)
    base = np.arange(N)[:, None, None] * nb + c[None]

    Dl = bandp[jnp.asarray(d_idx)[None].repeat(N, axis=0).reshape(N, nb, nb),
               jnp.asarray(base)]
    Dl = Dl * jnp.asarray(lower_ok)[None]
    D = Dl + jnp.triu(Dl.transpose(0, 2, 1), 1)

    # E[i][r, c] = A[(i+1)nb + r, i*nb + c] = band[nb + r - c, i*nb + c]
    e_off = nb + r - c
    e_ok = (e_off >= 1) & (e_off <= b)
    e_idx = np.where(e_ok, e_off, 0)
    ebase = np.arange(N - 1)[:, None, None] * nb + c[None] if N > 1 else \
        np.zeros((0, nb, nb), dtype=int)
    if N > 1:
        E = bandp[jnp.asarray(e_idx)[None].repeat(N - 1, axis=0),
                  jnp.asarray(ebase)]
        E = E * jnp.asarray(e_ok)[None]
        E = jnp.concatenate([E, jnp.zeros((1, nb, nb), dtype=band.dtype)])
    else:
        E = jnp.zeros((1, nb, nb), dtype=band.dtype)
    return D, E


def btd_cholesky(D: jnp.ndarray, E: jnp.ndarray) -> BTDFactor:
    """Cholesky of the block-tridiagonal matrix given by (D, E).
    One lax.scan of N steps; failure (non-PD) yields NaNs in L and a
    wrong-inertia report."""
    N, nb, _ = D.shape
    n_dim = N * nb

    def step(carry, inp):
        Ssub = carry                       # C_{i-1} C_{i-1}^T
        D_i, E_i = inp
        L_i = jnp.linalg.cholesky(D_i - Ssub)
        # Ct_i = L_i^{-1} E_i^T
        Ct_i = jax.scipy.linalg.solve_triangular(L_i, E_i.T, lower=True)
        return Ct_i.T @ Ct_i, (L_i, Ct_i)

    _, (L, Ct) = lax.scan(step, jnp.zeros((nb, nb), dtype=D.dtype), (D, E))
    ok = jnp.all(jnp.isfinite(L))
    zero = jnp.asarray(0)
    return BTDFactor(
        L=jnp.where(ok, L, 0.0), Ct=Ct,
        num_pos=jnp.where(ok, n_dim, 0),
        num_neg=zero,
        num_zero=jnp.where(ok, zero, n_dim))


def btd_solve(fac: BTDFactor, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = rhs given the BTD Cholesky factor.  rhs (n,) is padded
    internally to N*nb."""
    N, nb, _ = fac.L.shape
    n = rhs.shape[0]
    n_pad = N * nb
    r = jnp.concatenate([rhs, jnp.zeros((n_pad - n,), dtype=rhs.dtype)]) \
        if n_pad > n else rhs
    rb = r.reshape(N, nb)

    # forward: L y = r, block rows  L_i y_i = r_i - C_{i-1} y_{i-1},
    # C_{i-1} = Ct_{i-1}^T
    def fwd(y_prev, inp):
        r_i, L_i, Ct_prev = inp
        y_i = jax.scipy.linalg.solve_triangular(
            L_i, r_i - Ct_prev.T @ y_prev, lower=True)
        return y_i, y_i

    Ct_shift = jnp.concatenate(
        [jnp.zeros((1, nb, nb), dtype=fac.Ct.dtype), fac.Ct[:-1]])
    _, y = lax.scan(fwd, jnp.zeros((nb,), dtype=rhs.dtype),
                    (rb, fac.L, Ct_shift))

    # backward: L^T x = y, block rows  L_i^T x_i = y_i - Ct_i x_{i+1}
    def bwd(x_next, inp):
        y_i, L_i, Ct_i = inp
        x_i = jax.scipy.linalg.solve_triangular(
            L_i.T, y_i - Ct_i @ x_next, lower=False)
        return x_i, x_i

    _, x = lax.scan(bwd, jnp.zeros((nb,), dtype=rhs.dtype),
                    (y, fac.L, fac.Ct), reverse=True)
    return x.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("nb",))
def band_cholesky_solve(band, rhs, nb: int):
    """Convenience: factor + solve in one call (tests, one-shot uses)."""
    D, E = band_to_blocks(band, nb)
    fac = btd_cholesky(D, E)
    return btd_solve(fac, rhs), fac
