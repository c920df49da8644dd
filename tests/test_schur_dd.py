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


def test_aadj_dd_sparse_vs_exact():
    """Sparse-storage dd adjoint (round-5: removes the dense-only dd2
    guard): per-cell TwoProd + exact dd tree reduction + collision-free
    placement must match the exact rational sum y_j A_j."""
    from loraine_tpu.ops.dd import DD
    from loraine_tpu.ops.schur import Aadj, Aadj_dd
    from loraine_tpu.problem import ensure_dd_aadj

    n, m = 12, 10
    A = np.zeros((n, m, m))
    for j in range(n):  # few-entry sparse symmetric data with cell overlap
        for _ in range(3):
            r, c = rng.integers(0, 4, 2)  # small range -> many collisions
            v = rng.standard_normal()
            A[j, r, c] += v
            if r != c:
                A[j, c, r] += v
        A[j, j % m, j % m] += 1.0
    C = np.eye(m) * m
    p = problem_from_dense([A], [C], np.zeros(n), storage="sparse",
                           pad_multiple=1)
    p = ensure_dd_aadj(p)
    g = p.groups[0]
    assert g.is_sparse and g.Acell is not None

    y_hi = rng.standard_normal(n)
    y_lo = rng.standard_normal(n) * 1e-18
    got = Aadj_dd(g, DD(jnp.asarray(y_hi), jnp.asarray(y_lo)))
    # exact rational oracle over the (padded-expanded) dense data
    Ad = np.zeros((m, m))
    for a in range(m):
        for b in range(m):
            exact = sum(
                (_frac(A[j, a, b]) * (_frac(y_hi[j]) + _frac(y_lo[j]))
                 for j in range(n)),
                Fraction(0),
            )
            err = abs(_frac(got.hi[0, a, b]) + _frac(got.lo[0, a, b]) - exact)
            assert err <= abs(exact) * Fraction(1, 10**25) + Fraction(1, 10**28)
    # hi part matches the f64 adjoint to f64 accuracy
    f64 = np.asarray(Aadj(g, jnp.asarray(y_hi)))
    assert np.allclose(np.asarray(got.hi), f64, rtol=1e-12, atol=1e-12)


def test_aadj_dd_rank1_vs_exact():
    """Rank-1 dd adjoint: TwoProd factor scaling + Ozaki GEMM vs the exact
    rational sum sgn_j y_j b_j b_j^T."""
    from loraine_tpu.ops.dd import DD
    from loraine_tpu.ops.schur import Aadj_dd

    p = _mk_problem(n=8, m=6, rank1=True)
    g = p.groups[0]
    assert g.is_rank1
    n = 8
    y_hi = rng.standard_normal(n)
    y_lo = rng.standard_normal(n) * 1e-18
    got = Aadj_dd(g, DD(jnp.asarray(y_hi), jnp.asarray(y_lo)))
    B = np.asarray(g.B)
    S = np.asarray(g.Bsgn)
    for a, b in [(0, 0), (1, 4), (5, 2)]:
        exact = sum(
            (_frac(S[0, j]) * (_frac(y_hi[j]) + _frac(y_lo[j]))
             * _frac(B[0, j, a]) * _frac(B[0, j, b]) for j in range(n)),
            Fraction(0),
        )
        err = abs(_frac(got.hi[0, a, b]) + _frac(got.lo[0, a, b]) - exact)
        assert err <= abs(exact) * Fraction(1, 10**25) + Fraction(1, 10**28)


def test_schur_sparse_dd_vs_exact():
    """Sparse-storage dd Schur assembly (round-5: without it the sparse
    dd2 refinement targeted an f64-rounded operator and err1 floored at
    9e-15): the dd gather pipeline must match the exact rational
    <A_j, W A_k W> to dd resolution."""
    from loraine_tpu.ops.schur import _schur_sparse, _schur_sparse_dd

    n, m = 14, 8
    A = np.zeros((n, m, m))
    for j in range(n):
        r, c = rng.integers(0, m, 2)
        v = rng.standard_normal()
        A[j, r, c] += v
        if r != c:
            A[j, c, r] += v
        A[j, j % m, j % m] += 1.0
    p = problem_from_dense([A], [np.eye(m) * m], np.zeros(n),
                           storage="sparse", pad_multiple=1)
    g = p.groups[0]
    W = rng.standard_normal((1, g.m, g.m))
    W = jnp.asarray(W @ W.transpose(0, 2, 1) + g.m * np.eye(g.m))
    Hdd = _schur_sparse_dd(g, W)
    Wn = np.asarray(W)
    for j, k in [(0, 0), (3, 7), (9, 2)]:
        exact = Fraction(0)
        for a in range(m):
            for b in range(m):
                if A[j, a, b] == 0:
                    continue
                wak = sum(
                    (_frac(Wn[0, a, t]) * _frac(A[k, t, u]) * _frac(Wn[0, u, b])
                     for t in range(m) for u in range(m) if A[k, t, u] != 0),
                    Fraction(0),
                )
                exact += _frac(A[j, a, b]) * wak
        got = _frac(Hdd.hi[j, k]) + _frac(Hdd.lo[j, k])
        assert abs(got - exact) <= abs(exact) * Fraction(1, 10**25) + Fraction(1, 10**28)
    # hi part agrees with the f64 gather path to f64 accuracy
    He = np.asarray(_schur_sparse(g, W))
    assert np.allclose(np.asarray(Hdd.hi), He, rtol=1e-12, atol=1e-12)
