"""Preconditioned conjugate gradients as a jit-safe ``lax.while_loop``.

Replaces the reference's external ConjugateGradients.jl dependency
(`src/predictor_corrector.jl:134,235`). Convergence: relative residual
``||r|| <= tol * ||b||`` with an iteration cap (reference uses
``maxIter = 10000``).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pcg"]


class _CGCarry(NamedTuple):
    x: jax.Array
    r: jax.Array
    z: jax.Array
    p: jax.Array
    rz: jax.Array
    it: jax.Array


def pcg(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    precond: Callable[[jax.Array], jax.Array],
    tol: jax.Array,
    maxiter: int,
) -> Tuple[jax.Array, jax.Array]:
    """Solve A x = b with preconditioned CG. Returns (x, iterations)."""
    normb = jnp.linalg.norm(b)
    threshold = tol * normb
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    carry0 = _CGCarry(x=x0, r=r0, z=z0, p=z0, rz=jnp.vdot(r0, z0), it=jnp.int32(0))

    def cond(c: _CGCarry):
        return jnp.logical_and(jnp.linalg.norm(c.r) > threshold, c.it < maxiter)

    def body(c: _CGCarry):
        Ap = matvec(c.p)
        pAp = jnp.vdot(c.p, Ap)
        alpha = c.rz / pAp
        x = c.x + alpha * c.p
        r = c.r - alpha * Ap
        z = precond(r)
        rz = jnp.vdot(r, z)
        beta = rz / c.rz
        p = z + beta * c.p
        return _CGCarry(x=x, r=r, z=z, p=p, rz=rz, it=c.it + 1)

    out = lax.while_loop(cond, body, carry0)
    return out.x, out.it
