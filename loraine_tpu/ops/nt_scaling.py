"""Nesterov-Todd scaling point, batched over a block group.

Reference math (`src/prepare_W.jl:28-94`): per block,

    L_x = chol(X),  L_s = chol(S)
    U Sigma V^T = svd(L_s^T L_x)
    D   = Sigma                       (so eig(X S) = D^2)
    G   = L_x V D^{-1/2}              (then G^T S G = D,  G G^T = W)
    Gi  = D^{1/2} V^T L_x^{-1}
    W   = G G^T                       (NT scaling point: W S W = X)
    Si  = S^{-1}
    DDsi = diag(G^T S G)^{-1/2}

On TPU this runs as one batched chol+chol+svd over the ``nb`` axis of a block
group — no per-block loop. Cholesky failures are handled by the bounded
1e-5*I shift loop (reference `try_cholesky`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .eigh import eigh_backend_for, eigh_jacobi, eigh_mixed
from .linalg import chol_reg, tri_solve, sym

__all__ = ["NTScaling", "nt_scale", "lin_scale"]


def _eigh(M: jax.Array, backend: str):
    resolved = eigh_backend_for(backend, M.shape[-1])
    if resolved == "jacobi":
        return eigh_jacobi(M)
    if resolved == "mixed":
        return eigh_mixed(M)
    if resolved == "pallas":
        return eigh_mixed(M, seed="pallas")
    return jnp.linalg.eigh(M)


class NTScaling(NamedTuple):
    D: jax.Array  # [nb, m]
    G: jax.Array  # [nb, m, m]
    Gi: jax.Array  # [nb, m, m]
    W: jax.Array  # [nb, m, m]
    Si: jax.Array  # [nb, m, m]
    DDsi: jax.Array  # [nb, m]
    ok: jax.Array  # bool scalar


def nt_scale(
    X: jax.Array,
    S: jax.Array,
    reg_eps: float = 1e-5,
    max_reg: int = 1000,
    method: str = "eigh",
    eigh_backend: str = "jacobi",
) -> NTScaling:
    """Compute the NT scaling for a stacked group of blocks [nb, m, m].

    X and S factorize in ONE batched Cholesky over a [2nb, m, m] stack —
    on TPU the small-matrix decompositions are latency-bound, so halving
    their count halves this phase.

    method:
      'eigh' (default): V and D^2 from eigh(L_x^T S L_x) — the right
        singular vectors / squared singular values of L_s^T L_x, without
        instantiating the SVD codepath (XLA's f64 QDWH-SVD is a large,
        slow-to-compile program on TPU; eigh alone suffices since U is
        never used).
      'svd': the reference formulation (`src/prepare_W.jl:37-47`).
    """
    nb, m = X.shape[0], X.shape[-1]
    cboth = chol_reg(jnp.concatenate([X, S], axis=0), reg_eps, max_reg)
    Lx, Ls = cboth.L[:nb], cboth.L[nb:]

    if method == "svd":
        CC = jnp.swapaxes(Ls, -1, -2) @ Lx  # L_s^T L_x
        _, D, Vt = jnp.linalg.svd(CC)
        V = jnp.swapaxes(Vt, -1, -2)
    else:
        # eig(L_x^T S L_x) = V D^2 V^T with the same V as svd(L_s^T L_x)
        M = jnp.swapaxes(Lx, -1, -2) @ S @ Lx
        lam, V = _eigh(sym(M), eigh_backend)
        D = jnp.sqrt(jnp.maximum(lam, 1e-300))

    d_isqrt = 1.0 / jnp.sqrt(D)
    G = (Lx @ V) * d_isqrt[..., None, :]
    # Gi = D^{1/2} V^T Lx^{-1};  (Lx^{-T} V)^T = V^T Lx^{-1}
    Gi = jnp.sqrt(D)[..., :, None] * jnp.swapaxes(tri_solve(Lx, V, trans=True), -1, -2)
    W = G @ jnp.swapaxes(G, -1, -2)

    eye = jnp.broadcast_to(jnp.eye(m, dtype=X.dtype), X.shape)
    Si = tri_solve(Ls, tri_solve(Ls, eye), trans=True)
    Si = sym(Si)

    # diag(G^T S G) without forming the full product
    SG = S @ G
    dd = jnp.einsum("...ma,...ma->...a", G, SG)
    DDsi = 1.0 / jnp.sqrt(dd)

    return NTScaling(D=D, G=G, Gi=Gi, W=W, Si=Si, DDsi=DDsi, ok=cboth.ok)


def lin_scale(S_lin: jax.Array) -> jax.Array:
    """Elementwise inverse for the LP cone (`src/prepare_W.jl:85-89`)."""
    return 1.0 / S_lin
