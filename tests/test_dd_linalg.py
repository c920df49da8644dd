"""dd dense linear algebra (ops/dd_linalg.py) against mpmath oracles.

These kernels exist to break the f64 NT wall (docs/precision.md): the NT
scaling factorizations in dd so the congruent spectrum eig(XS) survives
mu < 1e-14. The oracle is mpmath at 50 digits; pass tolerances are the
dd accuracy class (~1e-26..1e-30 relative), far beyond anything f64
arithmetic could fake.

Note: XLA:CPU's fusion contracts error-free transforms (CLAUDE.md), so dd
on CPU is not bit-exact — tolerances here are set at the accuracy class,
not at exactness.
"""
import mpmath as mp
import numpy as np
import pytest

import jax.numpy as jnp

from loraine_tpu.ops.dd import DD, dd_to_f64
from loraine_tpu.ops.dd_linalg import (
    dd_chol,
    dd_div,
    dd_eigh_jacobi,
    dd_matmul,
    dd_mul,
    dd_sqrt,
)

mp.mp.dps = 50


def _to_dd(x):
    """mpmath matrix/array -> DD pair representing it to ~2^-106."""
    a = np.array([[float(x[i, j]) for j in range(x.cols)] for i in range(x.rows)])
    lo = np.array(
        [[float(x[i, j] - mp.mpf(a[i, j])) for j in range(x.cols)] for i in range(x.rows)]
    )
    return DD(jnp.asarray(a), jnp.asarray(lo))


def _dd_val(hi, lo):
    return mp.mpf(float(hi)) + mp.mpf(float(lo))


def _rel_err(hi, lo, ref):
    return abs((_dd_val(hi, lo) - ref) / ref) if ref != 0 else abs(_dd_val(hi, lo))


def test_dd_scalar_ops_accuracy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.standard_normal() * 10.0 ** rng.integers(-8, 8)
        b = rng.standard_normal() * 10.0 ** rng.integers(-8, 8)
        da = DD(jnp.asarray(a), jnp.asarray(0.0))
        db = DD(jnp.asarray(b), jnp.asarray(0.0))
        r = dd_mul(da, db)
        assert _rel_err(r.hi, r.lo, mp.mpf(a) * mp.mpf(b)) < 1e-30
        r = dd_div(da, db)
        assert _rel_err(r.hi, r.lo, mp.mpf(a) / mp.mpf(b)) < 1e-29
        r = dd_sqrt(DD(jnp.asarray(abs(a)), jnp.asarray(0.0)))
        assert _rel_err(r.hi, r.lo, mp.sqrt(abs(mp.mpf(a)))) < 1e-29


def test_dd_sqr_alias_safety():
    """Regression for the MEASURED XLA:CPU jit hazards (see dd_linalg
    _dealias/dd_const docstrings): (1) dd_mul with an aliased operand
    (x*x), (2) dd_add with a literal-constant operand — both degraded to
    plain-f64 accuracy inside jit via simplifier folds. dd_sqr and
    dd_const must hold dd accuracy under jit."""
    import jax

    from loraine_tpu.ops.dd import dd_add
    from loraine_tpu.ops.dd_linalg import dd_const, dd_sqr

    rng = np.random.default_rng(4)
    xh = rng.standard_normal(64) * 3.0
    xl = xh * 1e-17 * rng.standard_normal(64)
    X = DD(jnp.asarray(xh), jnp.asarray(xl))

    @jax.jit
    def f(X):
        sq = dd_sqr(X)  # |sq| spans ~[0, 9]: exercises |t2| > 1
        return dd_add(dd_const(1.0, sq.hi), sq)

    r = f(X)
    for i in range(64):
        ref = 1 + (mp.mpf(xh[i]) + mp.mpf(xl[i])) ** 2
        assert _rel_err(r.hi[i], r.lo[i], ref) < 1e-29, i


def test_dd_sqrt_nonpositive_is_zero():
    r = dd_sqrt(DD(jnp.asarray(-3.0), jnp.asarray(0.0)))
    assert float(r.hi) == 0.0 and float(r.lo) == 0.0


def test_dd_matmul_vs_mpmath():
    rng = np.random.default_rng(1)
    m = 9
    A = mp.matrix([[mp.mpf(rng.standard_normal()) + mp.mpf(rng.standard_normal()) * mp.mpf(2) ** -55
                    for _ in range(m)] for _ in range(m)])
    B = mp.matrix([[mp.mpf(rng.standard_normal()) + mp.mpf(rng.standard_normal()) * mp.mpf(2) ** -55
                    for _ in range(m)] for _ in range(m)])
    Add, Bdd = _to_dd(A), _to_dd(B)
    R = dd_matmul(DD(Add.hi[None], Add.lo[None]), DD(Bdd.hi[None], Bdd.lo[None]))
    C = A * B
    scale = max(abs(C[i, j]) for i in range(m) for j in range(m))
    for i in range(m):
        for j in range(m):
            err = abs(_dd_val(R.hi[0, i, j], R.lo[0, i, j]) - C[i, j])
            assert err / scale < 1e-28


def _graded_spd(m, span, seed=3):
    """mpmath SPD matrix with eigenvalue scales spread over 10**-span —
    far below f64 absolute resolution, the eig(XS) ~ mu regime. Returned
    ALREADY ROUNDED to its dd representation (reconstructed exactly in
    mpmath), so oracles measure the algorithm, not the input rounding:
    representing any dense matrix in dd perturbs its tiny eigenvalues by
    ~2^-106 * ||A|| absolutely, which no algorithm can undo."""
    rng = np.random.default_rng(seed)
    Q64 = np.linalg.qr(rng.standard_normal((m, m)))[0]
    Q = mp.matrix(Q64.tolist())
    d = [mp.mpf(10) ** (-span * i / (m - 1)) * (1 + mp.mpf(rng.standard_normal()) / 10)
         for i in range(m)]
    A = Q * mp.diag(d) * Q.T
    dd = _to_dd(A)
    hi, lo = np.asarray(dd.hi), np.asarray(dd.lo)
    A_dd = mp.matrix([[mp.mpf(hi[i, j]) + mp.mpf(lo[i, j]) for j in range(m)]
                      for i in range(m)])
    return A_dd, dd


def test_dd_chol_graded():
    m = 10
    A, Add = _graded_spd(m, 20)
    L, ok = dd_chol(DD(Add.hi[None], Add.lo[None]))
    assert bool(ok[0])
    Lmp = mp.cholesky(A)
    # graded-chol forward accuracy: the column-j pivot suffers cancellation
    # ~||A|| / lam_j, so the attainable relative error is ~u_dd * ||A|| /
    # L[j,j]^2 — measure against that envelope (plus margin), per entry
    for i in range(m):
        for j in range(i + 1):
            ref = Lmp[i, j]
            if abs(ref) < mp.mpf(1e-40):
                continue
            envelope = max(mp.mpf(1e-29) / (Lmp[j, j] ** 2), mp.mpf(1e-28))
            assert _rel_err(L.hi[0, i, j], L.lo[0, i, j], ref) < envelope, (i, j)
    # backward error at dd class
    R = dd_matmul(DD(L.hi, L.lo),
                  DD(jnp.swapaxes(L.hi, -1, -2), jnp.swapaxes(L.lo, -1, -2)))
    for i in range(m):
        for j in range(m):
            err = abs(_dd_val(R.hi[0, i, j], R.lo[0, i, j]) - A[i, j])
            assert err < 1e-28, (i, j)


def test_dd_chol_reports_indefinite():
    A = np.diag([1.0, -1e-30, 1.0])
    _, ok = dd_chol(DD(jnp.asarray(A)[None], jnp.zeros((1, 3, 3))))
    assert not bool(ok[0])
    # and a PD matrix whose definiteness is invisible at f64: the dd pair
    # carries the tiny positive pivot in the lo word
    B_hi = np.diag([1.0, 0.0, 1.0])
    B_lo = np.diag([0.0, 1e-25, 0.0])
    L, ok = dd_chol(DD(jnp.asarray(B_hi)[None], jnp.asarray(B_lo)[None]))
    assert bool(ok[0])
    assert abs(_dd_val(L.hi[0, 1, 1], L.lo[0, 1, 1]) - mp.sqrt(mp.mpf(1e-25))) < 1e-40


def test_dd_eigh_graded_beyond_f64():
    """Eigenvalues of a graded SPD matrix (spread 1e-20) to ~u_dd * ||A||
    ABSOLUTE accuracy — i.e. RELATIVE accuracy ~1e-30/lam even for the tiny
    end of the spectrum, where f64 arithmetic (absolute floor u64 * ||A|| ~
    1e-16) would return pure noise. This is exactly the margin that breaks
    the f64 NT wall: at mu ~ 1e-18 the congruent spectrum keeps ~14 correct
    digits instead of none."""
    m = 8
    A, Add = _graded_spd(m, 20, seed=5)
    M = DD(Add.hi[None], Add.lo[None])
    lam, V = dd_eigh_jacobi(M)
    E, _ = mp.eigsy(A)
    refs = sorted([E[i] for i in range(m)])
    for i in range(m):
        abs_err = abs(_dd_val(lam.hi[0, i], lam.lo[0, i]) - refs[i])
        assert abs_err < 1e-29, i  # ~u_dd * ||A|| * small growth
    # the large end is fully relative-accurate
    assert _rel_err(lam.hi[0, -1], lam.lo[0, -1], refs[-1]) < 1e-26
    # f64 comparison point: the small half would carry ZERO correct digits
    lam64 = np.linalg.eigvalsh(np.asarray(M.hi[0]))
    assert abs(lam64[0] - float(refs[0])) > 100 * abs(
        float(_dd_val(lam.hi[0, 0], lam.lo[0, 0]) - refs[0])
    )
    # eigenvector orthogonality at dd class
    Vh = np.asarray(V.hi[0]) ; Vl = np.asarray(V.lo[0])
    VtV = dd_matmul(DD(jnp.asarray(Vh.T)[None], jnp.asarray(Vl.T)[None]),
                    DD(jnp.asarray(Vh)[None], jnp.asarray(Vl)[None]))
    ortho_err = np.abs(np.asarray(dd_to_f64(VtV))[0] - np.eye(m)).max()
    assert ortho_err < 1e-28


def test_dd_eigh_warm_start_matches_cold():
    m = 12
    A, Add = _graded_spd(m, 16, seed=7)
    M = DD(Add.hi[None], Add.lo[None])
    lam_cold, _ = dd_eigh_jacobi(M)
    V0 = jnp.asarray(np.linalg.eigh(np.asarray(M.hi[0]))[1])[None]
    lam_warm, _ = dd_eigh_jacobi(M, V0=V0)
    E, _ = mp.eigsy(A)
    refs = sorted([E[i] for i in range(m)])
    for i in range(m):
        assert abs(_dd_val(lam_warm.hi[0, i], lam_warm.lo[0, i]) - refs[i]) < 1e-29, i
        assert abs(_dd_val(lam_cold.hi[0, i], lam_cold.lo[0, i]) - refs[i]) < 1e-29, i


def test_dd_eigh_odd_size():
    m = 7
    A, Add = _graded_spd(m, 10, seed=9)
    lam, V = dd_eigh_jacobi(DD(Add.hi[None], Add.lo[None]))
    E, _ = mp.eigsy(A)
    refs = sorted([E[i] for i in range(m)])
    for i in range(m):
        assert abs(_dd_val(lam.hi[0, i], lam.lo[0, i]) - refs[i]) < 1e-29, i


def test_nt_scale_dd_identities_beyond_f64():
    """Native dd NT scaling (nt_scale_dd): with X carrying a mu ~ 1e-16
    spectrum (its tiny eigenvalues live below f64 absolute resolution), the
    scaling point must still satisfy the defining NT identities at dd
    accuracy — the exact regime where the f64 path's D is formation noise
    (docs/precision.md "the f64 NT wall"). Reference: `src/prepare_W.jl:
    28-94` at `T = Float64x4` (`src/Solvers.jl:18`)."""
    from loraine_tpu.ops.nt_scaling import nt_scale, nt_scale_dd

    m = 8
    Xmp, Xdd = _graded_spd(m, 16, seed=11)
    Smp, Sdd = _graded_spd(m, 12, seed=13)
    X = DD(Xdd.hi[None], Xdd.lo[None])
    S = DD(Sdd.hi[None], Sdd.lo[None])
    nts, tails = nt_scale_dd(X, S)
    assert bool(tails.dd_ok)

    # oracle: D = sqrt(eig(X S)) in mpmath
    E, _ = mp.eigsy(mp.cholesky(Xmp).T * Smp * mp.cholesky(Xmp))
    refs = sorted([mp.sqrt(E[i]) for i in range(m)])
    for i in range(m):
        got = _dd_val(nts.D[0, i], tails.D_lo[0, i])
        rel = abs((got - refs[i]) / refs[i])
        # high RELATIVE accuracy across the whole graded spectrum (measured
        # 4e-18 on the tiny end: the graded dd-Cholesky forward error of
        # forming L_x' S L_x, not the Jacobi) — the f64 path has ZERO
        # correct digits on the small half (abs noise u64*||M|| >> lam)
        assert rel < 1e-14, (i, float(rel))
    # f64 comparison point on the tiny end: its D is formation noise
    base = nt_scale(np.asarray(X.hi), np.asarray(S.hi), method="eigh")
    f64_rel = abs((mp.mpf(float(base.D[0, 0])) - refs[0]) / refs[0])
    got0 = _dd_val(nts.D[0, 0], tails.D_lo[0, 0])
    assert f64_rel > 1e4 * abs((got0 - refs[0]) / refs[0])

    # W S W = X at dd-class accuracy (the identity the feasibility-exact
    # directions rely on); f64 W would miss at u64 * ||W||^2
    W = DD(jnp.asarray(nts.W), jnp.asarray(tails.W_lo))
    WSW = dd_matmul(W, dd_matmul(S, W))
    scale = float(np.abs(np.asarray(X.hi)).max())
    err = np.abs(np.asarray(dd_to_f64(WSW) - dd_to_f64(X))).max()
    assert err < 1e-25 * scale

    # G^T S G = diag(D) in dd
    G = DD(jnp.asarray(nts.G), jnp.asarray(tails.G_lo))
    GT = DD(jnp.swapaxes(G.hi, -1, -2), jnp.swapaxes(G.lo, -1, -2))
    GSG = dd_matmul(GT, dd_matmul(S, G))
    got = np.asarray(dd_to_f64(GSG))[0]
    offdiag = got - np.diag(np.diag(got))
    assert np.abs(offdiag).max() < 1e-25 * float(np.abs(got).max())

    # fallback contract: an X that is indefinite at dd resolution selects
    # the f64 result with zero tails and dd_ok=False
    Xbad_hi = np.asarray(X.hi).copy()
    Xbad_hi[0, -1, -1] = -1.0
    Xbad = DD(jnp.asarray(Xbad_hi), jnp.zeros_like(X.lo))
    Sgood = DD(S.hi, jnp.zeros_like(S.lo))
    nts_b, tails_b = nt_scale_dd(Xbad, Sgood)
    assert not bool(tails_b.dd_ok)
    base = nt_scale(Xbad.hi, Sgood.hi, method="eigh")
    np.testing.assert_allclose(np.asarray(nts_b.W), np.asarray(base.W))
    assert float(np.abs(np.asarray(tails_b.W_lo)).max()) == 0.0
