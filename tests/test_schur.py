"""Schur assembly and data-operator contractions vs naive dense oracles
(the reference enforces these only end-to-end; we unit-test per kernel,
SURVEY section 4 requirement)."""
import jax
import jax.numpy as jnp
import numpy as np

from loraine_tpu.problem import BlockGroup
from loraine_tpu.ops.schur import Aop, Aadj, schur_group, schur_lp


def _random_group(key, nb, n, m, rank1=False):
    ka, kc, kb = jax.random.split(key, 3)
    if rank1:
        B = jax.random.normal(kb, (nb, n, m), dtype=jnp.float64)
        sgn = jnp.where(jax.random.bernoulli(ka, 0.5, (nb, n)), 1.0, -1.0)
        A = jnp.einsum("bj,bjm,bjp->bjmp", sgn, B, B)
    else:
        A = jax.random.normal(ka, (nb, n, m, m), dtype=jnp.float64)
        A = (A + jnp.swapaxes(A, -1, -2)) / 2
        B = sgn = None
    C = jax.random.normal(kc, (nb, m, m), dtype=jnp.float64)
    C = (C + jnp.swapaxes(C, -1, -2)) / 2
    g = BlockGroup(
        C=C, A=None if rank1 else A, B=B, Bsgn=sgn,
        Arows=None, Acols=None, Avals=None,
        m=m, nb=nb, orig_sizes=(m,) * nb, orig_indices=tuple(range(nb)),
    )
    return g, A


def _random_spd(key, nb, m):
    a = jax.random.normal(key, (nb, m, m), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + m * jnp.eye(m, dtype=jnp.float64)


def test_aop_aadj_adjoint():
    key = jax.random.PRNGKey(1)
    g, A = _random_group(key, 2, 7, 6)
    X = _random_spd(jax.random.PRNGKey(2), 2, 6)
    y = jax.random.normal(jax.random.PRNGKey(3), (7,), dtype=jnp.float64)
    # <Aadj(y), X> == <y, Aop(X)>
    lhs = jnp.sum(Aadj(g, y) * X)
    rhs = jnp.dot(y, Aop(g, X))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def test_schur_dense_vs_oracle():
    key = jax.random.PRNGKey(4)
    nb, n, m = 2, 5, 6
    g, A = _random_group(key, nb, n, m)
    W = _random_spd(jax.random.PRNGKey(5), nb, m)
    # G only used for rank-1; pass a Cholesky-like factor
    G = jnp.linalg.cholesky(W)
    H = schur_group(g, W, G)
    oracle = np.zeros((n, n))
    An, Wn = np.asarray(A), np.asarray(W)
    for b in range(nb):
        for j in range(n):
            for k in range(n):
                oracle[j, k] += np.trace(An[b, j] @ Wn[b] @ An[b, k] @ Wn[b])
    np.testing.assert_allclose(np.asarray(H), oracle, rtol=1e-10)


def test_schur_rank1_matches_dense():
    key = jax.random.PRNGKey(6)
    nb, n, m = 2, 5, 6
    g1, A = _random_group(key, nb, n, m, rank1=True)
    gdense = BlockGroup(
        C=g1.C, A=A, B=None, Bsgn=None,
        Arows=None, Acols=None, Avals=None, m=m, nb=nb,
        orig_sizes=g1.orig_sizes, orig_indices=g1.orig_indices,
    )
    Wf = _random_spd(jax.random.PRNGKey(7), nb, m)
    G = jnp.linalg.cholesky(Wf)
    W = G @ jnp.swapaxes(G, -1, -2)
    H1 = schur_group(g1, W, G)
    H2 = schur_group(gdense, W, G)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), rtol=1e-9)
    # operators agree too
    X = _random_spd(jax.random.PRNGKey(8), nb, m)
    np.testing.assert_allclose(np.asarray(Aop(g1, X)), np.asarray(Aop(gdense, X)), rtol=1e-9)
    y = jax.random.normal(jax.random.PRNGKey(9), (n,), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(Aadj(g1, y)), np.asarray(Aadj(gdense, y)), rtol=1e-9, atol=1e-9)


def test_schur_lp_oracle():
    key = jax.random.PRNGKey(10)
    C_lin = jax.random.normal(key, (5, 3), dtype=jnp.float64)
    w = jnp.abs(jax.random.normal(jax.random.PRNGKey(11), (3,), dtype=jnp.float64))
    H = schur_lp(C_lin, w)
    oracle = np.asarray(C_lin) @ np.diag(np.asarray(w)) @ np.asarray(C_lin).T
    np.testing.assert_allclose(np.asarray(H), oracle, rtol=1e-12)
