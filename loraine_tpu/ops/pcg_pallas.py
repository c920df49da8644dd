"""Single-kernel Pallas PCG for the materialized small-n CG path.

Why: on latency-dominated small problems (control1-class, n <= 512) the
XLA-level PCG (`ops/cg.py`) pays per-op overhead on every one of its ~5
kernels per CG iteration inside the device while-loop — measured ~265 us
per CG iteration at n=21 on v5e, i.e. ~14 ms of a ~21 ms IPM iteration is
pure loop/dispatch bookkeeping. This kernel runs the ENTIRE preconditioned
CG loop in VMEM in f32 with no per-op XLA dispatch, and the caller wraps it
in f64 iterative refinement so the returned solution meets f64 tolerances.

Operator and preconditioner are the SAME materialized matrices the XLA path
uses (H and the H_alpha/H_beta inverse-Cholesky factor, see
`step.py`/`ops/precond.py`; reference CG call sites
`src/predictor_corrector.jl:118-140,224-239`), so CG trajectories and
iteration counts stay comparable.

Layout: vectors are carried as [np, 128] tiles with all 128 lanes equal —
matvecs are then single MXU matmuls ([np,np] @ [np,128]) whose result again
has equal lanes, and no transposes are needed anywhere in the loop. The
128x flop redundancy is irrelevant at these sizes (np <= 512).

Refinement: solve H d = r with the f32 kernel, update x (f64), recompute
r = b - H x in f64, repeat (static `passes`, early passes that already meet
the tolerance make the kernel exit immediately via its residual test).
Converges to the f64 tolerance whenever the f32 preconditioned CG reduces
the residual at all — the same contract as the dd refinement machinery
(`step.py:solve_cg_dd`), one precision level down.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pcg_pallas_mixed", "pcg_pallas_ff"]

_LANES = 128


def _round_up(x: int, k: int) -> int:
    return ((x + k - 1) // k) * k


def _kernel(tol2_ref, maxiter_ref, H, b, x_out, it_out):
    """Plain CG on the padded split-preconditioned [np, np] system, vectors
    as equal-lane [np, 128]. The caller passes Hp = Mli H Mli^T (kappa ~
    O(10-1e3) when the H_alpha preconditioner is any good), which keeps the
    f32 residual floor (~u32 * kappa) far below the per-pass tolerance.
    Stopping: ||r||^2 <= tol2 (pre-scaled by the caller) or maxiter.
    """
    f32 = jnp.float32
    tol2 = tol2_ref[0]
    maxiter = maxiter_ref[0]
    Hm = H[...]
    bv = b[...]

    def matH(v):
        # HIGHEST: full-f32 multi-pass MXU arithmetic — the default single
        # bf16 pass quantizes operands to 8 mantissa bits (measured 1.5e-2
        # relative on v5e)
        return jax.lax.dot_general(
            Hm, v, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def dot(a, c):
        return jnp.sum(a * c) * (1.0 / _LANES)

    r0 = bv
    carry0 = (
        jnp.zeros_like(bv),  # x
        r0,
        r0,  # p
        dot(r0, r0),  # rr
        jnp.int32(0),
    )

    def cond(c):
        return jnp.logical_and(c[3] > tol2, c[4] < maxiter)

    def body(c):
        x, r, p, rr, it = c
        Ap = matH(p)
        pAp = dot(p, Ap)
        alpha = rr / jnp.where(pAp != 0.0, pAp, f32(1))
        x = x + alpha * p
        r = r - alpha * Ap
        rr_new = dot(r, r)
        beta = rr_new / jnp.where(rr != 0.0, rr, f32(1))
        p = r + beta * p
        return (x, r, p, rr_new, it + 1)

    out = jax.lax.while_loop(cond, body, carry0)
    x_out[...] = out[0]
    it_out[0] = out[4]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pcg_f32(H32, bcol, tol2, maxiter, interpret: bool):
    np_ = H32.shape[0]
    with jax.enable_x64(False):
        x, it = pl.pallas_call(
            _kernel,
            out_shape=(
                jax.ShapeDtypeStruct((np_, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=interpret,
        )(
            jnp.asarray(tol2, jnp.float32).reshape(1),
            jnp.asarray(maxiter, jnp.int32).reshape(1),
            H32,
            bcol,
        )
    return x, it[0]


def pcg_pallas_mixed(
    H: jax.Array,
    Mli: jax.Array,
    b: jax.Array,
    tol: jax.Array,
    maxiter: int,
    passes: int = 3,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Solve H x = b to ||r|| <= tol * ||b|| (f64) via the f32 in-VMEM PCG
    kernel wrapped in f64 iterative refinement.

    H: [n, n] f64 SPD (materialized Schur operator), Mli: [n, n] f64
    inverse Cholesky factor of the preconditioner (z = Mli^T Mli r).
    Returns (x [n] f64, total inner CG iterations int32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = H.shape[-1]
    np_ = max(_round_up(n, _LANES), _LANES)
    f64 = H.dtype

    # split-preconditioned operator: Hp = Mli H Mli^T (f64 GEMMs, then cast)
    MliT = Mli.T
    Hp = Mli @ H @ MliT
    Hp = (Hp + Hp.T) / 2

    pad = np_ - n
    H32 = jnp.zeros((np_, np_), jnp.float32).at[:n, :n].set(Hp.astype(jnp.float32))
    if pad:
        # decoupled identity tail keeps the padded system SPD and the pad
        # components of every CG vector exactly zero (rhs pads to zero)
        H32 = H32 + jnp.diag(
            jnp.concatenate(
                [jnp.zeros((n,), jnp.float32), jnp.ones((pad,), jnp.float32)]
            )
        )

    normb = jnp.linalg.norm(b)
    safe_normb = jnp.where(normb > 0, normb, jnp.asarray(1.0, f64))
    target = tol * safe_normb  # absolute f64 residual target

    # CG in exact arithmetic finishes in n steps; the f32 kernel gets a
    # noise margin. A stalled pass (weak preconditioner) burns at most this.
    cap = min(int(maxiter), 2 * n + 64)

    x = jnp.zeros((n,), f64)
    r = b
    its = jnp.int32(0)
    for _ in range(passes):
        rp = Mli @ r  # preconditioned residual (f64)
        nr = jnp.linalg.norm(rp)
        safe_nr = jnp.where(nr > 0, nr, jnp.asarray(1.0, f64))
        # stop the inner CG a bit below the pro-rated share of the target
        # (the Mli^T back-map redistributes the residual); the outer f64
        # residual recompute + next pass absorb the slack
        done = jnp.linalg.norm(r) <= target
        tol_inner = jnp.maximum(0.25 * target / safe_nr, 5.0e-7)
        # an already-converged pass exits before its first iteration
        tol_inner = jnp.where(done, jnp.asarray(2.0, f64), tol_inner)
        bcol = jnp.broadcast_to(
            jnp.pad((rp / safe_nr).astype(jnp.float32), (0, pad))[:, None],
            (np_, _LANES),
        )
        u32, it = _pcg_f32(
            H32, bcol, (tol_inner.astype(jnp.float32)) ** 2,
            jnp.int32(cap), interpret,
        )
        d = MliT @ (u32[:n, 0].astype(f64) * nr)
        x = x + d
        r = b - H @ x
        its = its + it
    return x, its


# ---------------------------------------------------------------------------
# Float-float (2xf32, ~2^-48) in-VMEM CG — the precision the f32 kernel lacks.
#
# Why: the f32 kernel above stalls when kappa of the split-preconditioned
# system exceeds ~1/u32 (measured ~1e10 on control1 near convergence, see
# config.py cg_kernel). Carrying every vector and the operator as an
# UNEVALUATED SUM OF TWO f32 WORDS (double-float / "ff") restores ~47
# mantissa bits — f64-class — while every operation stays an f32 VPU op
# inside one Pallas kernel: the whole CG loop still runs with NO per-op XLA
# dispatch, which is the entire latency win on small-n problems
# (~180 us/CG-iteration for the XLA loop vs one kernel per solve here).
#
# Building blocks are the classical error-free transforms (TwoSum, Dekker
# split / TwoProd — no FMA needed, TPU VPU f32 is IEEE round-to-nearest):
# the same algebra as ops/dd.py one precision level down. Reductions that
# must not round (matvec rows, dot products) are pairwise two_sum trees over
# power-of-two tile halves. Transposes (column-form <-> row-form vector
# tiles) are EXACT identity matmuls on the MXU: every product is x*1 or x*0
# and every accumulation has exactly one nonzero term, so no rounding
# regardless of the MXU's internal f32 pass structure.
#
# Operator/preconditioner are the same materialized matrices as the XLA
# path (split-preconditioned system Hp = Mli H Mli^T, reference CG call
# sites `src/predictor_corrector.jl:118-140,224-239`), so CG trajectories
# and iteration counts stay comparable — oracle-tested against the f64 CG
# in tests/test_pcg_pallas.py.
# ---------------------------------------------------------------------------

_DEKKER = 4097.0  # 2^12 + 1: splits an f32 into two 12-bit halves

# The error-free transforms below are exact only if every f32 operation
# rounds exactly once. The Mosaic TPU compiler lowers mul/add/sub 1:1 to
# VPU ops (no FMA contraction, no algebraic float rewrites) — verified by
# the on-device exactness probe in tests/test_pcg_pallas.py. XLA:CPU (the
# interpret-mode path used by the CPU test suite) does NOT preserve them:
# its fusion emitter re-materializes products into consumer loops and LLVM
# contracts mul+add to FMA, which breaks the renormalization identities at
# u32 level (and `lax.optimization_barrier` is both stripped by XLA:CPU and
# unsupported by the Mosaic lowering, so it cannot pin them). The ff kernel
# is therefore TPU-only in production; interpret-mode tests check the
# trajectory/stopping logic at f32-level tolerances only.


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a, b):
    """Assumes |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def _split32(a):
    t = jnp.float32(_DEKKER) * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a, b):
    p = a * b
    ah, al = _split32(a)
    bh, bl = _split32(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def _ff_add(ah, al, bh, bl):
    s, e = _two_sum(ah, bh)
    e = e + (al + bl)
    return _quick_two_sum(s, e)


def _ff_neg(ah, al):
    return -ah, -al


def _ff_mul(ah, al, bh, bl):
    p, e = _two_prod(ah, bh)
    e = e + (ah * bl + al * bh)
    return _quick_two_sum(p, e)


def _ff_div(ah, al, bh, bl):
    """One Newton correction on the f32 quotient: ~full ff accuracy."""
    q1 = ah / bh
    ph, plo = _ff_mul(q1, jnp.zeros_like(q1), bh, bl)
    rh, rl = _ff_add(ah, al, -ph, -plo)
    q2 = rh / bh
    return _quick_two_sum(q1, q2)


def _pow2_pad(n: int) -> int:
    """Smallest power-of-two multiple of _LANES holding n (the pairwise
    reduction trees below halve exactly)."""
    p = _LANES
    while p < n:
        p *= 2
    return p


def _ff_reduce(h, l, axis: int):
    """Pairwise two_sum tree along `axis` (whose size must be a power of
    two); returns the ff sum with size-1 on that axis. Rounding per level is
    the two_sum renormalization only — the reduction is exact to ff."""
    n = h.shape[axis]
    while n > 1:
        k = n // 2
        if axis == 0:
            ah, al, bh, bl = h[:k], l[:k], h[k:n], l[k:n]
        else:
            ah, al, bh, bl = h[:, :k], l[:, :k], h[:, k:n], l[:, k:n]
        h, l = _ff_add(ah, al, bh, bl)
        n = k
    return h, l


def _kernel_ff(tol2_ref, maxiter_ref, Hh, Hl, bh, bl, xh_out, xl_out, it_out):
    """CG on the padded split-preconditioned system in ff arithmetic.

    Vectors are column-form [np, 128] tiles with all lanes equal; ff scalars
    are [1, 128] tiles. Matvec: p -> row-form by exact MXU transpose, one
    elementwise ff multiply against H, pairwise-tree lane reduction.
    """
    f32 = jnp.float32
    tol2 = tol2_ref[0]
    maxiter = maxiter_ref[0]
    Hmh = Hh[...]
    Hml = Hl[...]
    np_ = Hmh.shape[0]
    rh0 = bh[...]
    rl0 = bl[...]

    rows = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (np_, np_), 1)
    eye = (rows == cols).astype(f32)

    def transpose(v):
        # out[a, b] = sum_j v[j, a] I[j, b] = v[b, a]: exact with HIGHEST
        # (one nonzero term per accumulation, products by 0/1 exact in the
        # f32 multi-pass decomposition). The DEFAULT precision is a single
        # bf16 pass, which quantizes v to 8 mantissa bits — measured 1.5e-2
        # relative error on v5e, which silently destroyed the ff arithmetic.
        return jax.lax.dot_general(
            v, eye, (((0,), (0,)), ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def matH(ph, plo):
        # column-form [np, 128] -> row tile [1, np] broadcast to [np, np]
        pth = transpose(ph)[0:1, :]
        ptl = transpose(plo)[0:1, :]
        prh = jnp.broadcast_to(pth, (np_, np_))
        prl = jnp.broadcast_to(ptl, (np_, np_))
        wh, wl = _ff_mul(Hmh, Hml, prh, prl)
        sh, sl = _ff_reduce(wh, wl, axis=1)  # [np, 1]
        return (
            jnp.broadcast_to(sh, (np_, _LANES)),
            jnp.broadcast_to(sl, (np_, _LANES)),
        )

    def dot(ah, al, ch, cl):
        wh, wl = _ff_mul(ah, al, ch, cl)
        sh, sl = _ff_reduce(wh, wl, axis=0)  # [1, 128], all lanes equal
        return sh, sl

    rrh0, rrl0 = dot(rh0, rl0, rh0, rl0)
    # control-flow scalars are extracted with jnp.max over the equal-lane
    # tile (exact: all entries equal). Indexing tile[0, 0] inside the loop
    # is NOT used — measured on v5e it reads garbage under the Mosaic
    # lowering (the tolerance/stall exits then never fire).
    rr_s0 = jnp.max(rrh0)
    carry0 = (
        jnp.zeros_like(rh0), jnp.zeros_like(rh0),  # x
        rh0, rl0,  # r
        rh0, rl0,  # p
        rrh0, rrl0,  # rr = <r, r>
        jnp.int32(0),  # it
        jnp.zeros_like(rh0), jnp.zeros_like(rh0),  # best x (min ||r||)
        rr_s0,  # rr scalar (stopping test)
        rr_s0,  # best rr scalar
        jnp.int32(0),  # iterations since last improvement
    )

    # The CG residual 2-norm is NOT monotone; at high kappa it can exceed
    # ||b|| by orders of magnitude mid-run (plateaus scale with the problem
    # size). Returning the minimum-residual iterate (not the last) keeps
    # every refinement pass a contraction, and the stall counter exits once
    # the ff floor (~2^-47 kappa) is reached instead of burning the
    # iteration cap; the caller's f64 fallback finishes any shortfall.
    _STALL = jnp.int32(np_ // 2 + 64)

    def cond(c):
        run = jnp.logical_and(c[11] > tol2, c[8] < maxiter)
        return jnp.logical_and(run, c[13] < _STALL)

    def body(c):
        (xh, xl, rh, rl, ph, plo, rrh, rrl, it,
         bxh, bxl, _rr_s, brr_s, stall) = c
        Aph, Apl = matH(ph, plo)
        pAph, pApl = dot(ph, plo, Aph, Apl)
        pAph = jnp.where(pAph != 0.0, pAph, f32(1))
        alh, all_ = _ff_div(rrh, rrl, pAph, pApl)
        th, tl = _ff_mul(alh, all_, ph, plo)
        xh, xl = _ff_add(xh, xl, th, tl)
        th, tl = _ff_mul(alh, all_, Aph, Apl)
        rh, rl = _ff_add(rh, rl, -th, -tl)
        rrh_n, rrl_n = dot(rh, rl, rh, rl)
        rrh_d = jnp.where(rrh != 0.0, rrh, f32(1))
        # zero the lo word alongside the hi guard so the degenerate-breakdown
        # denominator stays a consistent ff pair (1, 0) rather than (1, rrl)
        rrl_d = jnp.where(rrh != 0.0, rrl, f32(0))
        beh, bel = _ff_div(rrh_n, rrl_n, rrh_d, rrl_d)
        th, tl = _ff_mul(beh, bel, ph, plo)
        ph, plo = _ff_add(rh, rl, th, tl)
        rr_s = jnp.max(rrh_n)
        improved = rr_s < brr_s
        bxh = jnp.where(improved, xh, bxh)
        bxl = jnp.where(improved, xl, bxl)
        brr_s = jnp.where(improved, rr_s, brr_s)
        stall = jnp.where(improved, jnp.int32(0), stall + 1)
        return (xh, xl, rh, rl, ph, plo, rrh_n, rrl_n, it + 1,
                bxh, bxl, rr_s, brr_s, stall)

    out = jax.lax.while_loop(cond, body, carry0)
    xh_out[...] = out[9]
    xl_out[...] = out[10]
    it_out[0] = out[8]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pcg_ff(Hh, Hl, bh, bl, tol2, maxiter, interpret: bool):
    np_ = Hh.shape[0]
    with jax.enable_x64(False):
        xh, xl, it = pl.pallas_call(
            _kernel_ff,
            out_shape=(
                jax.ShapeDtypeStruct((np_, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((np_, _LANES), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=interpret,
        )(
            jnp.asarray(tol2, jnp.float32).reshape(1),
            jnp.asarray(maxiter, jnp.int32).reshape(1),
            Hh,
            Hl,
            bh,
            bl,
        )
    return xh, xl, it[0]


def _to_ff(x64):
    """Exact f64 -> (hi, lo) f32 pair split."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(x64.dtype)).astype(jnp.float32)
    return hi, lo


def pcg_pallas_ff(
    H: jax.Array,
    Mli: jax.Array,
    b: jax.Array,
    tol: jax.Array,
    maxiter: int,
    passes: int = 2,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Solve H x = b to ||r|| <= tol * ||b|| (f64) with the ff in-VMEM CG
    kernel wrapped in f64 iterative refinement.

    Same contract/arguments as `pcg_pallas_mixed`; the ff body's residual
    floor is ~2^-47 * kappa instead of ~2^-24 * kappa, so it keeps
    converging on the late-IPM systems (kappa ~ 1e10) where the f32 body
    stalls. Two refinement passes in f64 absorb the f32-rhs quantization
    (u32 contraction per pass).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = H.shape[-1]
    np_ = _pow2_pad(n)  # the in-kernel reduction trees halve exactly
    f64 = H.dtype

    MliT = Mli.T
    Hp = Mli @ H @ MliT
    Hp = (Hp + Hp.T) / 2

    pad = np_ - n
    Hp_pad = jnp.zeros((np_, np_), f64).at[:n, :n].set(Hp)
    if pad:
        # decoupled identity tail keeps the padded system SPD and the pad
        # components of every CG vector exactly zero (rhs pads to zero)
        Hp_pad = Hp_pad.at[jnp.arange(n, np_), jnp.arange(n, np_)].set(1.0)
    Hh, Hl = _to_ff(Hp_pad)

    normb = jnp.linalg.norm(b)
    safe_normb = jnp.where(normb > 0, normb, jnp.asarray(1.0, f64))
    target = tol * safe_normb  # absolute f64 residual target

    # allow the high-kappa iteration counts the f64 XLA loop would also
    # need; the kernel's own stall detector exits dead passes early
    cap = min(int(maxiter), 4 * n + 128)

    x = jnp.zeros((n,), f64)
    r = b
    its = jnp.int32(0)
    for _ in range(passes):
        rp = Mli @ r  # preconditioned residual (f64)
        nr = jnp.linalg.norm(rp)
        safe_nr = jnp.where(nr > 0, nr, jnp.asarray(1.0, f64))
        rnorm = jnp.linalg.norm(r)
        done = rnorm <= target
        # the ff body resolves ~2^-47-relative residuals; floor well above
        tol_inner = jnp.maximum(0.25 * target / safe_nr, 1.0e-12)
        tol_inner = jnp.where(done, jnp.asarray(2.0, f64), tol_inner)
        rpn = jnp.pad(rp / safe_nr, (0, pad))
        bh64, bl64 = _to_ff(rpn)
        bh = jnp.broadcast_to(bh64[:, None], (np_, _LANES))
        bl = jnp.broadcast_to(bl64[:, None], (np_, _LANES))
        uh, ul, it = _pcg_ff(
            Hh, Hl, bh, bl, (tol_inner.astype(jnp.float32)) ** 2,
            jnp.int32(cap), interpret,
        )
        u = uh[:n, 0].astype(f64) + ul[:n, 0].astype(f64)
        # refinement must contract: reject an update that worsened the true
        # residual (kernel returns its min-residual iterate, but the split
        # back-map can still redistribute badly on a stalled pass)
        x_cand = x + MliT @ (u * nr)
        r_cand = b - H @ x_cand
        better = jnp.linalg.norm(r_cand) < rnorm
        x = jnp.where(better, x_cand, x)
        r = jnp.where(better, r_cand, r)
        its = its + it
    return x, its
