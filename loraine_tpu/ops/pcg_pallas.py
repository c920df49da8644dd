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

__all__ = ["pcg_pallas_mixed"]

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
        return jax.lax.dot_general(
            Hm, v, (((1,), (0,)), ((), ())), preferred_element_type=f32
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
