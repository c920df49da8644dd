"""dd-mode Schur assembly / data-operator ops vs exact rational oracles."""
from fractions import Fraction

import numpy as np
import jax.numpy as jnp

from loraine_tpu.ops.schur import Aop_dd, schur_group, schur_group_dd
from loraine_tpu.problem import problem_from_dense

rng = np.random.default_rng(3)


def _mk_problem(n=6, m=8, rank1=False):
    A = rng.standard_normal((n, m, m))
    A = (A + A.transpose(0, 2, 1)) / 2
    if rank1:
        b = rng.standard_normal((n, m))
        A = np.einsum("jm,jp->jmp", b, b)
    C = rng.standard_normal((m, m))
    C = (C + C.T) / 2
    bvec = rng.standard_normal(n)
    return problem_from_dense(
        [A], [C], bvec, datarank=-1 if rank1 else 0, storage="dense"
    )


def _frac(x):
    return Fraction(float(x))


def test_aop_dd_matches_exact():
    p = _mk_problem()
    g = p.groups[0]
    M = rng.standard_normal((1, g.m, g.m))
    got = Aop_dd(g, jnp.asarray(M))
    A = np.asarray(g.A)
    for j in [0, 3, 5]:
        exact = sum(
            (_frac(A[0, j, a, b]) * _frac(M[0, a, b])
             for a in range(g.m) for b in range(g.m)),
            Fraction(0),
        )
        err = abs(_frac(got.hi[j]) + _frac(got.lo[j]) - exact)
        assert err <= abs(exact) * Fraction(1, 10**25) + Fraction(1, 10**28)


def test_schur_group_dd_dense_vs_exact():
    p = _mk_problem()
    g = p.groups[0]
    W = rng.standard_normal((1, g.m, g.m))
    W = W @ W.transpose(0, 2, 1) + np.eye(g.m)
    G = np.linalg.cholesky(W)
    Hdd = schur_group_dd(g, jnp.asarray(W), jnp.asarray(G))
    A = np.asarray(g.A)
    m = g.m
    for j, k in [(0, 0), (2, 4)]:
        # exact <A_j, W A_k W> as rationals
        WA = [[sum((_frac(W[0, a, t]) * _frac(A[0, k, t, b]) for t in range(m)), Fraction(0))
               for b in range(m)] for a in range(m)]
        WAW = [[sum((WA[a][t] * _frac(W[0, t, b]) for t in range(m)), Fraction(0))
                for b in range(m)] for a in range(m)]
        exact = sum(
            (_frac(A[0, j, a, b]) * WAW[a][b] for a in range(m) for b in range(m)),
            Fraction(0),
        )
        got = _frac(Hdd.hi[j, k]) + _frac(Hdd.lo[j, k])
        assert abs(got - exact) <= abs(exact) * Fraction(1, 10**24)
    # hi part agrees with the f64 path to f64 accuracy
    Hf = np.asarray(schur_group(g, jnp.asarray(W), jnp.asarray(G)))
    assert np.allclose(np.asarray(Hdd.hi), Hf, rtol=1e-12, atol=1e-12)


def test_schur_group_dd_rank1_vs_f64():
    p = _mk_problem(rank1=True)
    g = p.groups[0]
    assert g.is_rank1
    W = rng.standard_normal((1, g.m, g.m))
    W = W @ W.transpose(0, 2, 1) + np.eye(g.m)
    G = np.linalg.cholesky(W)
    Hdd = schur_group_dd(g, jnp.asarray(W), jnp.asarray(G))
    Hf = np.asarray(schur_group(g, jnp.asarray(W), jnp.asarray(G)))
    assert np.allclose(np.asarray(Hdd.hi) + np.asarray(Hdd.lo), Hf, rtol=1e-10)
