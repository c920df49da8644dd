"""Accurate (double-double class) matrix multiply via the Ozaki scheme.

Computes ``A @ B`` to ~``bits`` significant bits using only STANDARD f64
GEMMs plus elementwise double-double accumulation — the TPU-native way to
get high-precision matmul: all heavy FLOPs stay MXU/GEMM-shaped instead of
scalarizing into software multiprecision (the reference reaches the same
capability through MultiFloats `Float64xN` scalars, `src/Solvers.jl:10`).

Scheme (Ozaki-Ogita-Oishi-Rump error-free matrix-product transform): slice
each operand into exponent-aligned pieces of ``beta`` significand bits,
with ``2*beta + ceil(log2(k)) <= 53`` (k = contraction length). Then every
partial product GEMM ``A_p @ B_q`` is EXACT in f64 (each output element is
a sum of <= 2^w grid-aligned products of <= 2*beta bits: no rounding).
The exact partials are accumulated elementwise in double-double, largest
first; pairs with ``(p+q)*beta > bits`` are truncated, bounding the total
relative error by ~2^-bits of |A||B| scale.

Used by the solver's high-precision mode (``precision='dd'``) for Schur
assembly and iterative refinement residuals.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .dd import DD, dd_add, two_sum

__all__ = [
    "slice_operand",
    "acc_matmul",
    "acc_matvec",
    "dd_gemm_hi_lo",
    "pow2_int",
    "ceil_log2",
]

_TINY = 2.0**-1000  # avoids log of 0 for all-zero rows


def pow2_int(e: jax.Array, dtype=jnp.float64) -> jax.Array:
    """EXACT 2**e for integer arrays e (|e| <= 1000), built by repeated
    squaring — every multiply of powers of two is exact in f64.

    Why not frexp/ldexp: on TPU the f64 X64 rewriter cannot lower frexp's
    s64 bitcast (measured: compile error), and exp2 on emulated f64 is not
    guaranteed to hit exact powers of two. No value here ever becomes inf
    (the TPU f64 emulation mishandles inf through where), because the
    squaring chain stops at 2**512.
    """
    neg = e < 0
    k = jnp.abs(e).astype(jnp.int32)
    result = jnp.ones(e.shape, dtype=dtype)
    base = jnp.full(e.shape, 2.0, dtype=dtype)
    for j in range(10):  # k < 1024
        result = jnp.where((k & 1) == 1, result * base, result)
        k = k >> 1
        if j < 9:  # 2**512 is the largest base needed; never overflow
            base = base * base
    return jnp.where(neg, 1.0 / result, result)


def ceil_log2(x: jax.Array) -> jax.Array:
    """int32 e with 2**e >= x (one bit of headroom against log2 rounding);
    x must be positive."""
    return (jnp.floor(jnp.log2(x)) + 2.0).astype(jnp.int32)


def _slice_params(k: int, bits: int):
    w = max(1, math.ceil(math.log2(max(2, k))))
    beta = (53 - w) // 2
    if beta < 10:
        raise ValueError(f"contraction length {k} too large for Ozaki slicing")
    # each operand must be covered to ~bits so that the dropped residual
    # times the other operand stays below the target
    nsl = max(2, math.ceil(bits / beta))
    return beta, nsl


def slice_operand(X: jax.Array, axis: int, beta: int, s: int):
    """Split X into s exponent-aligned slices of <= beta significand bits
    each (per-fiber along ``axis``), X == sum(slices) + residual (dropped).
    Returns a list of arrays shaped like X.

    Extraction is round-to-grid by exact power-of-two divide (q*sigma with
    integer |q| <= 2^(beta-1)): unlike the classic add-shift trick it has
    no sub-grid boundary case for negative values, and it lowers on TPU's
    emulated f64 (no frexp/ldexp)."""
    mx = jnp.max(jnp.abs(X), axis=axis, keepdims=True)
    e = ceil_log2(jnp.maximum(mx, _TINY))  # 2**e in [2*mx, 4*mx]
    slices = []
    R = X
    for i in range(s):
        sigma = pow2_int(e - beta * (i + 1), X.dtype)
        inv = pow2_int(beta * (i + 1) - e, X.dtype)
        q = jnp.round(R * inv) * sigma  # multiple of sigma, <= beta bits
        slices.append(q)
        R = R - q  # exact
    return slices


def acc_matmul(A: jax.Array, B: jax.Array, bits: int = 106) -> DD:
    """A [..., m, k] @ B [..., k, n] -> DD [..., m, n], accurate to ~2^-bits
    relative to the |A| |B| scale. Broadcasting batch dims follow
    ``jnp.matmul``."""
    k = A.shape[-1]
    if B.shape[-2] != k:
        raise ValueError(f"contraction mismatch {A.shape} @ {B.shape}")
    beta, s = _slice_params(k, bits)
    Asl = slice_operand(A, -1, beta, s)
    Bsl = slice_operand(B, -2, beta, s)
    acc = None
    # largest partials first: accumulate in increasing p+q
    for t in range(2 * s - 1):
        if (t + 2) * beta > bits + 2 * beta:  # truncate sub-target terms
            break
        for p in range(s):
            q = t - p
            if q < 0 or q >= s:
                continue
            part = Asl[p] @ Bsl[q]  # EXACT f64 GEMM by construction
            if acc is None:
                acc = DD(part, jnp.zeros_like(part))
            else:
                acc = dd_add(acc, DD(part, jnp.zeros_like(part)))
    return acc


def acc_matvec(A: jax.Array, x: jax.Array, bits: int = 106) -> DD:
    """A [..., m, k] @ x [..., k] -> DD [..., m]."""
    r = acc_matmul(A, x[..., None], bits=bits)
    return DD(r.hi[..., 0], r.lo[..., 0])


def dd_gemm_hi_lo(Ahi: jax.Array, Alo: jax.Array, B: jax.Array, bits: int = 106) -> DD:
    """(Ahi + Alo) @ B in dd: accurate GEMM on the hi part plus a plain f64
    GEMM for the lo part (whose own rounding error is ~u^2 of the total)."""
    r = acc_matmul(Ahi, B, bits=bits)
    lo_part = Alo @ B
    s = two_sum(r.hi, lo_part)
    return DD(s.hi, s.lo + r.lo)
