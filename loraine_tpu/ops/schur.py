"""Schur-complement assembly and data-operator contractions, batched.

The Schur ("Hessian") matrix of the IPM normal equations is

    H[j,k] = sum_i  < A_j^{(i)},  W_i A_k^{(i)} W_i >
             + (C_lin diag(x_lin / s_lin) C_lin^T)[j,k]

The reference assembles this with a three-regime sparse loop
(`src/makeBBBB.jl:24-218`); on TPU we use two batched GEMM contractions per
block group (dense data) or the rank-one compression

    H = sum_blocks ((B G)(B G)^T) ** 2        (elementwise square)

matching `makeBBBB_rank1` (`src/makeBBBB.jl:1-20`, O(n m^2 + n^2 m) per
block instead of O(n m^3 + n^2 m^2)).

Also provides the primal/adjoint data operators

    Aop(group, X)  = [ sum_b <A_j^{(b)}, X_b> ]_j          ([n])
    Aadj(group, y) = sum_j y_j A_j^{(b)}                    ([nb, m, m])

used for residuals, the matrix-free CG operator (`MyA`,
`src/Solvers.jl:572-614`), and right-hand sides (`makeRHS`,
`src/makeBBBB.jl:221-228`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..problem import BlockGroup

__all__ = [
    "Aop",
    "Aadj",
    "schur_group",
    "schur_lp",
    "lp_weight",
]


def Aop(group: BlockGroup, X: jax.Array) -> jax.Array:
    """[n] <- sum over the group's blocks of <A_j, X_b>."""
    if group.is_rank1:
        BX = jnp.einsum("bjm,bmp->bjp", group.B, X)
        vals = jnp.einsum("bjp,bjp->bj", BX, group.B)
        return jnp.sum(group.Bsgn * vals, axis=0)
    if group.is_sparse:
        # <A_j, X> = sum_t v_t X[r_t, c_t] (COO fully expanded)
        gathered = jax.vmap(lambda Xb, r, c: Xb[r, c])(X, group.Arows, group.Acols)
        return jnp.einsum("bjt,bjt->j", group.Avals, gathered)
    return jnp.einsum("bjpq,bpq->j", group.A, X)


def Aadj(group: BlockGroup, y: jax.Array) -> jax.Array:
    """[nb, m, m] <- sum_j y_j A_j per block."""
    if group.is_rank1:
        w = group.Bsgn * y[None, :]
        return jnp.einsum("bj,bjm,bjp->bmp", w, group.B, group.B)
    if group.is_sparse:
        w = group.Avals * y[None, :, None]  # [nb, n, s]
        def scatter(r, c, wv):
            out = jnp.zeros((group.m, group.m), dtype=w.dtype)
            return out.at[r.reshape(-1), c.reshape(-1)].add(wv.reshape(-1))
        return jax.vmap(scatter)(group.Arows, group.Acols, w)
    return jnp.einsum("j,bjpq->bpq", y, group.A)


def schur_group(group: BlockGroup, W: jax.Array, G: jax.Array) -> jax.Array:
    """[n, n] <- this group's contribution to H.

    Dense:   two batched GEMMs (T = W A W) + one [n,n] contraction.
    Rank-1:  with A_j = sgn_j b_j b_j^T,
             H[j,k] = sum_b sgn_j sgn_k (b_j^T W b_k)^2
                    = sum_b sgn sgn' o ((B G)(B G)^T)**2
             (`src/makeBBBB.jl:1-20`; the reference's factors are always
             sign-positive so its formula has no sign term).
    Sparse:  gather-based, see _schur_sparse.
    """
    if group.is_rank1:
        BG = jnp.einsum("bjm,bmp->bjp", group.B, G)
        P = jnp.einsum("bjp,bkp->bjk", BG, BG)
        return jnp.einsum("bj,bk,bjk,bjk->jk", group.Bsgn, group.Bsgn, P, P)
    if group.is_sparse:
        return _schur_sparse(group, W)
    T = jnp.einsum("bpa,bjaq->bjpq", W, group.A)
    T = jnp.einsum("bjpq,bqr->bjpr", T, W)
    return jnp.einsum("bjpq,bkpq->jk", group.A, T)


def _schur_sparse(group: BlockGroup, W: jax.Array) -> jax.Array:
    """Sparse-data Schur contribution via batched gathers + rank-s outer
    products, replacing the reference's scalar sparse loops
    (`src/makeBBBB.jl:39-218`) with a TPU-shaped pipeline:

        T_j = W A_j W = sum_t v_t W[:, r_t] W[c_t, :]     (rank-s outer sum)
        H[j, k] = <A_k, T_j> = sum_u v_u T_j[r_u, c_u]    (gather + reduce)

    chunked over j so the gathered [nb, J, n, s] tensor stays bounded.
    Cost O(n m^2 s + n^2 s) vs dense O(n m^3 + n^2 m^2).
    """
    nb, n, s = group.Avals.shape
    m = group.m
    # cap the per-chunk gather tensor around ~2^25 elements (256 MB f64)
    J = int(min(n, max(8, (1 << 25) // max(1, nb * n * s))))
    nch = -(-n // J)
    npad = nch * J

    def pad_r(x):
        return jnp.pad(x, ((0, 0), (0, npad - n), (0, 0)))

    rows_c = pad_r(group.Arows).reshape(nb, nch, J, s).transpose(1, 0, 2, 3)
    cols_c = pad_r(group.Acols).reshape(nb, nch, J, s).transpose(1, 0, 2, 3)
    vals_c = pad_r(group.Avals).reshape(nb, nch, J, s).transpose(1, 0, 2, 3)
    flatk = group.Arows.astype(jnp.int32) * m + group.Acols.astype(jnp.int32)

    def body(chunk):
        r_c, c_c, v_c = chunk  # each [nb, J, s]
        Wa = jax.vmap(lambda Wb, idx: Wb[idx])(W, r_c)  # [nb, J, s, m]
        Wc = jax.vmap(lambda Wb, idx: Wb[idx])(W, c_c)
        T2 = jnp.einsum("bjtp,bjt,bjtq->bjpq", Wa, v_c, Wc).reshape(nb, J, m * m)
        G = jax.vmap(lambda t2, fk: t2[:, fk.reshape(-1)])(T2, flatk)
        return jnp.einsum("bjks,bks->jk", G.reshape(nb, J, n, s), group.Avals)

    Hrows = jax.lax.map(body, (rows_c, cols_c, vals_c))  # [nch, J, n]
    return Hrows.reshape(npad, n)[:n]


def lp_weight(X_lin: jax.Array, S_lin_inv: jax.Array) -> jax.Array:
    return X_lin * S_lin_inv


def schur_lp(C_lin: jax.Array, w: jax.Array) -> jax.Array:
    """[n, n] <- C_lin diag(w) C_lin^T."""
    return (C_lin * w[None, :]) @ C_lin.T
