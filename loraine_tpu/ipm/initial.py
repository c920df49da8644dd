"""Initial point heuristics.

Two strategies matching the reference (`src/initial_point.jl:17-81`):
  initpoint = 0: X = I, S = n * I (n = number of variables), LP vars = 1.
  initpoint = 1: SDPT3-like norm-scaled identity start.

These are one-time host-side computations (numpy-ish jnp, no jit needed).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import Options
from ..problem import SDPProblem
from .state import IPMState

__all__ = ["initial_point", "INITIAL_SIGMA", "TAU", "EXPON"]

# Reference constants `src/initial_point.jl:5-9`.
INITIAL_SIGMA = 3.0
TAU = 0.95
EXPON = 3.0


def _group_data_fro_norms(g) -> np.ndarray:
    """Per-block Frobenius norm of the stacked data operator,
    ||AA_i||_F = sqrt(sum_j ||A_j||_F^2)."""
    if g.is_rank1:
        # ||sgn b b^T||_F = ||b||^2
        sq = jnp.sum(g.B**2, axis=-1)  # [nb, n]
        return np.asarray(jnp.sqrt(jnp.sum(sq**2, axis=-1)))
    if g.is_sparse:
        # expanded COO lists both triangles, so sum(v^2) is exactly ||.||_F^2
        return np.asarray(jnp.sqrt(jnp.sum(g.Avals**2, axis=(-1, -2))))
    return np.asarray(jnp.sqrt(jnp.sum(g.A**2, axis=(-1, -2, -3))))


def initial_point(problem: SDPProblem, opts: Options) -> IPMState:
    dtype = problem.b.dtype
    n = problem.n
    b2 = 1.0 + np.abs(np.asarray(problem.b))
    norm_b2 = float(np.linalg.norm(b2))

    Xs, Ss = [], []
    for g in problem.groups:
        m = g.m
        eye = jnp.eye(m, dtype=dtype)[None]
        if opts.initpoint == 0:
            eps = jnp.ones((g.nb,), dtype=dtype)
            eta = jnp.full((g.nb,), float(n), dtype=dtype)
        else:
            fro_A = _group_data_fro_norms(g)  # [nb]
            f = norm_b2 / (1.0 + fro_A)
            eps = np.sqrt(m) * np.maximum(1.0, np.sqrt(m) * f)
            fro_C = np.asarray(jnp.sqrt(jnp.sum(g.C**2, axis=(-1, -2))))
            mf = np.maximum(f, fro_C)
            mf = (1.0 + mf) / np.sqrt(m)
            eta = np.sqrt(m) * np.maximum(1.0, mf)
            eps = jnp.asarray(eps, dtype=dtype)
            eta = jnp.asarray(eta, dtype=dtype)
        Xs.append(eps[:, None, None] * eye)
        Ss.append(eta[:, None, None] * eye)

    if problem.nlin > 0:
        if opts.initpoint == 0:
            X_lin = jnp.ones((problem.nlin,), dtype=dtype)
            S_lin = jnp.ones((problem.nlin,), dtype=dtype)
        else:
            C_lin = np.asarray(problem.C_lin)  # [n, nlin]
            row_norms = np.linalg.norm(C_lin, axis=1)  # per variable j
            p = b2 / (1.0 + row_norms)
            epss = max(1.0, float(p.max())) if p.size else 1.0
            mf = max(float(row_norms.max()) if row_norms.size else 0.0,
                     float(np.linalg.norm(np.asarray(problem.d_lin))))
            etaa = max(1.0, mf / np.sqrt(problem.nlin))
            X_lin = jnp.full((problem.nlin,), epss, dtype=dtype)
            S_lin = jnp.full((problem.nlin,), etaa, dtype=dtype)
    else:
        X_lin = None
        S_lin = None

    return IPMState(
        X=tuple(Xs),
        S=tuple(Ss),
        y=jnp.zeros((n,), dtype=dtype),
        X_lin=X_lin,
        S_lin=S_lin,
        sigma=jnp.asarray(INITIAL_SIGMA, dtype=dtype),
    )
