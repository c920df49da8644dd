"""Batched f32 symmetric eigendecomposition as ONE Pallas TPU kernel.

Why this exists (the round-2 perf flagship): the IPM's per-iteration cost on
TPU is dominated by small/medium symmetric eigendecompositions (NT scaling,
steplength bounds — reference `src/prepare_W.jl:37-47`,
`src/predictor_corrector.jl:274-291`). The two prior backends both lose:

  * XLA's QDWH eigh takes MINUTES to compile per shape through the remote
    TPU tunnel (persistent-cached, but first-solve latency on every new
    problem shape is unacceptable), and its f64 variant costs ~10 s/call.
  * The in-house XLA-level Jacobi (`ops/eigh.py`) compiles in seconds but
    pays XLA per-op overhead on every one of its O(m * sweeps) sequential
    rotation rounds — ~27 ms at m=56, ~15 s at m=808.

This kernel runs the ENTIRE parallel cyclic Jacobi iteration — all rounds of
all sweeps — inside a single Pallas program, in VMEM, with no per-round XLA
op dispatch. f32 only (TPU has no native f64); callers refine the f32
eigenbasis to f64 with GEMM-only perturbation refinement (`ops/eigh.py:
eigh_mixed`), which is a handful of MXU-friendly f64 matmuls.

Algorithm: round-robin ("tournament") parallel ordering. The matrix rows are
kept in tournament-position order; every round rotates the m/2 disjoint pairs
(i, i + m/2) and then applies the fixed tournament permutation P so the next
round's pairs are again (i, i + m/2). After m-1 rounds every unordered pair
has been rotated exactly once and P^(m-1) = identity, so a full sweep leaves
the ordering unchanged. The two-sided update A <- P'J'AJP is performed as two
row-operations with a transpose in between (rows of A, then rows of A', which
are the not-yet-rotated columns); the eigenvector accumulator is stored
transposed (rows = eigenvectors) so it too needs only row operations.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "eigh_pallas_f32",
    "eigmin_pallas",
    "eig_bounds_pallas",
    "jacobi_sweeps_for",
    "bound_sweeps_for",
]

_SENTINEL = 2.0  # pad-diagonal value; real spectrum is normalized into [-1, 1]


def _round_up(x: int, k: int) -> int:
    return ((x + k - 1) // k) * k


def jacobi_sweeps_for(m: int) -> int:
    """Default sweep count reaching f32 seed quality (off-diagonal ~1e-7
    relative) from a cold start. Convergence is linear-ish for the first
    ~log2(m) sweeps and quadratic after; f32 target saves ~1 sweep vs the
    f64 count used by the XLA-level Jacobi (`eigh.py:_default_sweeps`).

    Round-4, large m only: one fewer sweep and a 13-sweep cap — the
    kernels were measured at ~30% of the maxG11 step, and the trimmed
    counts kept iteration counts identical on maxG11/thetaG11 (m ~ 800).
    Small m keeps the round-3 schedule: control1 (m=16, a marginal
    CG-path case) NaN'd under the trimmed seed — at tiny m the sweeps
    are cheap anyway."""
    base = np.ceil(np.log2(max(m, 4)))
    if m >= 256:
        # Round-5 trim: 13 -> 10 at maxG-class m. The f32 seed only has to
        # land within the f64 refinement's capture basin (eigh_mixed runs
        # 2 GEMM-only perturbation rounds on top); measured on maxG11 +
        # thetaG11: iteration counts and DIMACS anchors unchanged, NT eigh
        # phase ~25% cheaper.
        return int(np.clip(base + 1, 8, 10))
    return int(np.clip(base + 5, 8, 15))


def bound_sweeps_for(m: int) -> int:
    """Sweep count for the BOUNDS kernel (`eig_bounds_pallas`). Unlike the
    full eigensolve, the Gershgorin-of-rotated-matrix bound is valid for
    ANY sweep count — fewer sweeps only loosen it. After ~log2(m)+2 sweeps
    the off-diagonal mass is small enough that the bound slack perturbs a
    tau=0.95 steplength by well under 1%, while the sequential-rotation
    cost (the dominant term of the steplength phase at large m) is roughly
    halved vs `jacobi_sweeps_for`. Round-4 trim for LARGE m only (+1,
    cap 6; validated on maxG11/thetaG11 with identical iteration counts);
    small m keeps the round-3 schedule (see jacobi_sweeps_for)."""
    base = np.ceil(np.log2(max(m, 4)))
    if m >= 256:
        # Round-5: cap 6 -> 4, measured on the chip: thetaG11 unchanged
        # (17 iters, +3% it/s); maxG11 pays ONE extra iteration from the
        # looser bound while per-iteration cost drops ~6% (6.66 -> 7.09
        # it/s, wall within noise, objective/DIMACS anchors intact). Kept:
        # per-iteration cost is genuinely lower and iteration counts are
        # problem-dependent either way.
        return int(np.clip(base + 1, 4, 4))
    return int(np.clip(base + 2, 5, 8))


def _batch_block(mp: int) -> int:
    """Matrices per grid step: 3 [bb, mp, mp] f32 VMEM buffers + headroom
    within a ~12 MB budget."""
    per = 4 * mp * mp * 4  # bufA, bufB, bufV + in-block, bytes
    return max(1, min(128, (12 * 1024 * 1024) // per))


def _kernel(a_in, lam_ref, vt_ref, bufA, bufB, bufV, *, mp: int, sweeps: int):
    bb = a_in.shape[0]
    half = mp // 2
    f32 = jnp.float32

    rowid = jax.lax.broadcasted_iota(jnp.int32, (half, mp), 0)
    colid = jax.lax.broadcasted_iota(jnp.int32, (half, mp), 1)
    m_pp = (colid == rowid)[None]  # top-row diagonal entries A[i, i]
    m_pq = (colid == rowid + half)[None]  # pair coupling A[i, i+half]

    bufA[...] = a_in[...]
    eid0 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0)
    eid1 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)
    # NOTE: with jax_enable_x64 on, weak Python-float pairs inside jnp.where
    # promote to f64, which Mosaic cannot lay out — keep constants f32
    eye = jnp.where(eid0 == eid1, f32(1), f32(0))
    bufV[...] = jnp.broadcast_to(eye[None], (bb, mp, mp))

    def rot_store(M, c, s, dst):
        """dst <- P^T (J^T M) for the current pairing: rotate row pairs
        (i, i+half) by (c, s), then apply the tournament permutation
        [L0 | R0 L1..L_{h-2}] / [R1..R_{h-1} | L_{h-1}] to the rows."""
        top = M[:, :half, :]
        bot = M[:, half:, :]
        ct = c[:, :, None]
        st = s[:, :, None]
        ntop = ct * top - st * bot
        nbot = st * top + ct * bot
        dst[:, 0:1, :] = ntop[:, 0:1, :]
        dst[:, 1:2, :] = nbot[:, 0:1, :]
        dst[:, 2:half, :] = ntop[:, 1 : half - 1, :]
        dst[:, half : mp - 1, :] = nbot[:, 1:half, :]
        dst[:, mp - 1 : mp, :] = ntop[:, half - 1 : half, :]

    def round_body(_, carry):
        A = bufA[...]
        top = A[:, :half, :]
        bot = A[:, half:, :]
        app = jnp.sum(jnp.where(m_pp, top, 0.0), axis=2)  # [bb, half]
        apq = jnp.sum(jnp.where(m_pq, top, 0.0), axis=2)
        aqq = jnp.sum(jnp.where(m_pq, bot, 0.0), axis=2)

        # Givens angle zeroing A[p, q] (stable tan formula). The input is
        # normalized to spectral radius <= 1, so a fixed absolute threshold
        # is a relative one; inactive pairs (incl. all pad couplings, which
        # are exactly 0) get the identity rotation.
        active = jnp.abs(apq) > 1e-9 * (jnp.abs(app) + jnp.abs(aqq) + 1e-3)
        apq_safe = jnp.where(active, apq, f32(1))
        tau = (aqq - app) / (2.0 * apq_safe)
        sgn = jnp.where(tau >= 0.0, f32(1), f32(-1))
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(active, t, f32(0))
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c

        # rows: bufB <- P^T J^T A
        rot_store(A, c, s, bufB)
        # columns via transpose: bufA <- P^T J^T (bufB)^T = P^T J^T A J P
        Bt = jnp.transpose(bufB[...], (0, 2, 1))
        rot_store(Bt, c, s, bufA)
        # eigenvector accumulator (stored transposed): VT <- P^T J^T VT
        rot_store(bufV[...], c, s, bufB)
        bufV[...] = bufB[...]
        return carry

    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(sweeps * (mp - 1)), round_body, jnp.int32(0)
    )

    Afin = bufA[...]
    lam = jnp.sum(jnp.where((eid0 == eid1)[None], Afin, f32(0)), axis=2)
    # lam_ref is [bb, 8, mp] (8 sublane rows to satisfy TPU tiling); row 0 real
    lam_ref[...] = jnp.broadcast_to(lam[:, None, :], (bb, 8, mp))
    vt_ref[...] = bufV[...]


def _kernel_eigmin(a_in, g_ref, h_ref, bufA, bufB, *, mp: int, sweeps: int):
    """Eigenvalue-only variant: same Jacobi rounds without the eigenvector
    accumulator, ending in per-row Gershgorin bounds of the (nearly
    diagonal) rotated matrix: g_i = A_ii - sum_{j != i} |A_ij| (lower) and
    h_i = A_ii + sum_{j != i} |A_ij| (upper). min_i g_i / max_i h_i are TRUE
    spectrum bounds of the rotated matrix for ANY number of sweeps
    (Gershgorin), converging to lambda_min/max as the off-diagonal dies; the
    caller adds an f32 backward-error margin."""
    bb = a_in.shape[0]
    half = mp // 2
    f32 = jnp.float32

    rowid = jax.lax.broadcasted_iota(jnp.int32, (half, mp), 0)
    colid = jax.lax.broadcasted_iota(jnp.int32, (half, mp), 1)
    m_pp = (colid == rowid)[None]
    m_pq = (colid == rowid + half)[None]

    bufA[...] = a_in[...]

    def rot_store(M, c, s, dst):
        top = M[:, :half, :]
        bot = M[:, half:, :]
        ct = c[:, :, None]
        st = s[:, :, None]
        ntop = ct * top - st * bot
        nbot = st * top + ct * bot
        dst[:, 0:1, :] = ntop[:, 0:1, :]
        dst[:, 1:2, :] = nbot[:, 0:1, :]
        dst[:, 2:half, :] = ntop[:, 1 : half - 1, :]
        dst[:, half : mp - 1, :] = nbot[:, 1:half, :]
        dst[:, mp - 1 : mp, :] = ntop[:, half - 1 : half, :]

    def round_body(_, carry):
        A = bufA[...]
        top = A[:, :half, :]
        bot = A[:, half:, :]
        app = jnp.sum(jnp.where(m_pp, top, 0.0), axis=2)
        apq = jnp.sum(jnp.where(m_pq, top, 0.0), axis=2)
        aqq = jnp.sum(jnp.where(m_pq, bot, 0.0), axis=2)
        active = jnp.abs(apq) > 1e-9 * (jnp.abs(app) + jnp.abs(aqq) + 1e-3)
        apq_safe = jnp.where(active, apq, f32(1))
        tau = (aqq - app) / (2.0 * apq_safe)
        sgn = jnp.where(tau >= 0.0, f32(1), f32(-1))
        t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(active, t, f32(0))
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c
        rot_store(A, c, s, bufB)
        Bt = jnp.transpose(bufB[...], (0, 2, 1))
        rot_store(Bt, c, s, bufA)
        return carry

    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(sweeps * (mp - 1)), round_body, jnp.int32(0)
    )

    Afin = bufA[...]
    eid0 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 0)
    eid1 = jax.lax.broadcasted_iota(jnp.int32, (mp, mp), 1)
    diag = jnp.sum(jnp.where((eid0 == eid1)[None], Afin, f32(0)), axis=2)
    offsum = jnp.sum(jnp.abs(Afin), axis=2) - jnp.abs(diag)
    g_ref[...] = jnp.broadcast_to((diag - offsum)[:, None, :], (bb, 8, mp))
    h_ref[...] = jnp.broadcast_to((diag + offsum)[:, None, :], (bb, 8, mp))


@functools.partial(jax.jit, static_argnames=("sweeps", "interpret"))
def _eigmin_pallas_padded(Mp: jax.Array, sweeps: int, interpret: bool):
    nbp, mp, _ = Mp.shape
    bb = min(_batch_block(mp), nbp)
    nbg = _round_up(nbp, bb)
    if nbg != nbp:
        Mp = jnp.concatenate(
            [Mp, jnp.zeros((nbg - nbp, mp, mp), jnp.float32)], axis=0
        )
    kern = functools.partial(_kernel_eigmin, mp=mp, sweeps=sweeps)
    with jax.enable_x64(False):
        g, h = pl.pallas_call(
            kern,
            grid=(nbg // bb,),
            in_specs=[
                pl.BlockSpec(
                    (bb, mp, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=(
                pl.BlockSpec(
                    (bb, 8, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (bb, 8, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nbg, 8, mp), jnp.float32),
                jax.ShapeDtypeStruct((nbg, 8, mp), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((bb, mp, mp), jnp.float32),
                pltpu.VMEM((bb, mp, mp), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(Mp)
    return g[:nbp, 0, :], h[:nbp, 0, :]


# Empirical f32 backward-error margin for the certified eigmin bound (see
# eigmin_pallas): Jacobi in f32 diagonalizes A + E with ||E|| = O(eps32 *
# sqrt(m) * ||A||); the constant is calibrated in tests/test_jacobi_pallas.py
# against f64 eigensolves on hard spectra with ~10x headroom.
_EIGMIN_MARGIN_C = 32.0


def eig_bounds_pallas(
    M: jax.Array, sweeps: int | None = None, interpret: bool | None = None
) -> Tuple[jax.Array, jax.Array]:
    """Certified-up-to-f32-rounding bounds (lo <= lambda_min,
    hi >= lambda_max) per matrix.

    The steplength rule (`find_step`, reference
    `src/predictor_corrector.jl:274-291`) needs only lambda_min of the scaled
    directions (and, via the predictor identity scaleX = -I - scaleS, the
    lambda_max of scaleS); outward bounds are always safe — they only
    shorten the step. Bounds = Gershgorin of the Jacobi-rotated matrix +/- an
    f32 backward-error margin ~ C * eps32 * sqrt(m) * ||M||. Unlike a fixed-
    iteration Krylov (Lanczos) Ritz bound, the Gershgorin bound needs no
    completeness assumption: it holds for the rotated matrix exactly, for any
    sweep count.

    Returns ([nb], [nb]) in M.dtype.
    """
    nb, m, _ = M.shape
    if sweeps is None:
        sweeps = bound_sweeps_for(m)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    scale = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)
    scale = jnp.maximum(scale, 1e-300).astype(M.dtype)
    Mn = (M / scale[:, None, None]).astype(jnp.float32)
    mp = max(_round_up(m, 16), 16)
    if mp != m:
        pad = mp - m
        Mn = jnp.pad(Mn, ((0, 0), (0, pad), (0, pad)))
        diag_pad = jnp.concatenate(
            [jnp.zeros((m,), jnp.float32), jnp.full((pad,), _SENTINEL, jnp.float32)]
        )
        Mn = Mn + jnp.diag(diag_pad)[None]

    g, h = _eigmin_pallas_padded(Mn, sweeps, interpret)
    # pad rows stay decoupled and (after whole sweeps) in trailing positions;
    # exclude them — their sentinel diagonal would dominate the max bound
    lo = jnp.min(g[:, :m], axis=-1).astype(M.dtype)
    hi = jnp.max(h[:, :m], axis=-1).astype(M.dtype)
    margin = _EIGMIN_MARGIN_C * np.float64(np.finfo(np.float32).eps) * np.sqrt(m)
    return (lo - margin) * scale, (hi + margin) * scale


def eigmin_pallas(
    M: jax.Array, sweeps: int | None = None, interpret: bool | None = None
) -> jax.Array:
    """Certified-up-to-f32-rounding LOWER bound on lambda_min per matrix
    (see eig_bounds_pallas). Returns [nb] in M.dtype."""
    return eig_bounds_pallas(M, sweeps=sweeps, interpret=interpret)[0]


@functools.partial(jax.jit, static_argnames=("sweeps", "interpret"))
def _eigh_pallas_padded(Mp: jax.Array, sweeps: int, interpret: bool):
    """Mp: [nbp, mp, mp] f32, pre-normalized and pre-padded. Returns
    (lam [nbp, mp], VT [nbp, mp, mp]) unsorted."""
    nbp, mp, _ = Mp.shape
    bb = min(_batch_block(mp), nbp)
    # pad batch to a multiple of bb with decoupled zero matrices
    nbg = _round_up(nbp, bb)
    if nbg != nbp:
        Mp = jnp.concatenate(
            [Mp, jnp.zeros((nbg - nbp, mp, mp), jnp.float32)], axis=0
        )
    grid = nbg // bb
    kern = functools.partial(_kernel, mp=mp, sweeps=sweeps)
    # Trace the kernel with x64 disabled: the package enables jax_enable_x64
    # globally, which turns weak Python ints (loop bounds, index maps) into
    # i64 values Mosaic cannot lay out. Everything here is f32/i32.
    with jax.enable_x64(False):
        lam, vt = _call_kernel(kern, Mp, nbg, bb, mp, interpret)
    return lam[:nbp], vt[:nbp]


def _call_kernel(kern, Mp, nbg: int, bb: int, mp: int, interpret: bool):
    grid = nbg // bb
    lam, vt = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bb, mp, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((bb, 8, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, mp, mp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nbg, 8, mp), jnp.float32),
            jax.ShapeDtypeStruct((nbg, mp, mp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, mp, mp), jnp.float32),
            pltpu.VMEM((bb, mp, mp), jnp.float32),
            pltpu.VMEM((bb, mp, mp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(Mp)
    return lam[:, 0, :], vt


def eigh_pallas_f32(
    M: jax.Array, sweeps: int | None = None, interpret: bool | None = None
) -> Tuple[jax.Array, jax.Array]:
    """f32 eigendecomposition seed of a batch of symmetric matrices.

    Args:
      M: [nb, m, m], any float dtype (cast to f32 after normalization).
      sweeps: Jacobi sweeps (default `jacobi_sweeps_for(m)`).
      interpret: force Pallas interpreter mode (auto: on for non-TPU
        backends, where Mosaic is unavailable).

    Returns:
      (lam [nb, m] ascending, V [nb, m, m]) in f32, M ~ V diag(lam) V^T with
      off-diagonal residual ~1e-7 * ||M|| — a seed for `eigh_mixed`'s f64
      GEMM refinement, NOT full f64 accuracy.
    """
    nb, m, _ = M.shape
    if sweeps is None:
        sweeps = jacobi_sweeps_for(m)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # normalize: Gershgorin row-sum bound puts the spectrum in [-1, 1]
    scale = jnp.max(jnp.sum(jnp.abs(M), axis=-1), axis=-1)  # [nb]
    scale = jnp.maximum(scale, 1e-300).astype(M.dtype)
    Mn = (M / scale[:, None, None]).astype(jnp.float32)

    mp = max(_round_up(m, 16), 16)
    if mp != m:
        pad = mp - m
        Mn = jnp.pad(Mn, ((0, 0), (0, pad), (0, pad)))
        # decoupled pad block: sentinel diagonal sorts above the real
        # spectrum, zero coupling keeps it exactly invariant under rotation
        diag_pad = jnp.concatenate(
            [jnp.zeros((m,), jnp.float32), jnp.full((pad,), _SENTINEL, jnp.float32)]
        )
        Mn = Mn + jnp.diag(diag_pad)[None]

    lam, vt = _eigh_pallas_padded(Mn, sweeps, interpret)

    order = jnp.argsort(lam, axis=-1)[:, :m]  # pads (=sentinel) sort last
    lam = jnp.take_along_axis(lam, order, axis=-1)
    V = jnp.swapaxes(vt, -1, -2)[:, :m, :]  # columns = eigenvectors
    V = jnp.take_along_axis(V, order[:, None, :], axis=-1)
    lam = lam * scale[:, None].astype(jnp.float32)
    return lam, V
