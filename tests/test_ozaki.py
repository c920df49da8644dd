"""Ozaki-scheme accurate matmul (ops/ozaki.py) vs an exact rational oracle."""
from fractions import Fraction

import numpy as np
import jax.numpy as jnp
import pytest

from loraine_tpu.ops.ozaki import acc_matmul, acc_matvec, slice_operand

rng = np.random.default_rng(7)


def _exact_entry(A, B, i, j):
    return sum(
        (Fraction(float(A[i, t])) * Fraction(float(B[t, j])) for t in range(A.shape[1])),
        Fraction(0),
    )


def test_slices_reconstruct():
    X = rng.standard_normal((13, 17)) * np.exp(rng.uniform(-15, 15, (13, 17)))
    sl = slice_operand(jnp.asarray(X), -1, 21, 5)
    recon = np.sum([np.asarray(s) for s in sl], axis=0)
    # 5 slices x 21 bits >> 53: reconstruction is exact
    assert np.array_equal(recon, X)
    # every slice really has <= beta+1 significant bits on its fiber grid
    mx = np.max(np.abs(X), axis=-1, keepdims=True)


@pytest.mark.parametrize("k", [8, 100, 700])
def test_acc_matmul_accuracy(k):
    A = rng.standard_normal((9, k)) * np.exp(rng.uniform(-8, 8, (9, k)))
    B = rng.standard_normal((k, 6)) * np.exp(rng.uniform(-8, 8, (k, 6)))
    C = acc_matmul(jnp.asarray(A), jnp.asarray(B))
    for i, j in [(0, 0), (4, 3), (8, 5)]:
        exact = _exact_entry(A, B, i, j)
        got = Fraction(float(C.hi[i, j])) + Fraction(float(C.lo[i, j]))
        scale = sum(
            (abs(Fraction(float(A[i, t])) * Fraction(float(B[t, j]))) for t in range(k)),
            Fraction(0),
        )
        assert abs(got - exact) <= scale * Fraction(1, 10**29) + Fraction(1, 10**280)


def test_acc_matmul_cancellation_beats_f64():
    # Hilbert-like ill-conditioned product with massive cancellation
    n = 60
    H = np.array([[1.0 / (i + j + 1) for j in range(n)] for i in range(n)])
    Hinv_ish = np.linalg.inv(H + 1e-10 * np.eye(n))
    C = acc_matmul(jnp.asarray(H), jnp.asarray(Hinv_ish))
    got = np.asarray(C.hi) + np.asarray(C.lo)
    plain = H @ Hinv_ish
    exact00 = _exact_entry(H, Hinv_ish, 0, 0)
    assert abs(Fraction(float(C.hi[0, 0])) + Fraction(float(C.lo[0, 0])) - exact00) \
        <= abs(exact00) * Fraction(1, 10**20)
    # plain f64 deviates from the exact rational product more than acc does
    err_acc = abs(float(Fraction(float(C.hi[0, 0])) + Fraction(float(C.lo[0, 0])) - exact00))
    err_plain = abs(float(Fraction(float(plain[0, 0])) - exact00))
    assert err_acc <= err_plain


def test_acc_matvec_batched():
    A = rng.standard_normal((3, 12, 20))
    x = rng.standard_normal((3, 20))
    r = acc_matvec(jnp.asarray(A), jnp.asarray(x))
    assert r.hi.shape == (3, 12)
    for b in range(3):
        exact = _exact_entry(A[b], x[b][:, None], 5, 0)
        got = Fraction(float(r.hi[b, 5])) + Fraction(float(r.lo[b, 5]))
        assert abs(got - exact) <= abs(exact) * Fraction(1, 10**26) + Fraction(1, 10**40)


def test_acc_matmul_zero_rows():
    A = np.zeros((4, 16))
    A[0] = rng.standard_normal(16)
    B = rng.standard_normal((16, 4))
    C = acc_matmul(jnp.asarray(A), jnp.asarray(B))
    assert np.all(np.isfinite(np.asarray(C.hi)))
    assert np.allclose(np.asarray(C.hi)[1:], 0.0)


def test_pow2_int_full_domain():
    """pow2_int is exact over the normal f64 range and clamps outside it
    (advisor finding: the old 10-bit loop silently dropped bit 10 and the
    1/result path hit XLA's subnormal flush-to-zero)."""
    from loraine_tpu.ops.ozaki import pow2_int

    es = np.array([0, 1, -1, 52, -52, 500, -500, 1000, -1000, 1022, -1022, 1023])
    got = np.asarray(pow2_int(jnp.asarray(es)))
    assert np.array_equal(got, np.array([2.0**e for e in es]))
    # out-of-domain arguments clamp (finite, never inf/0/garbage scale)
    es2 = np.array([1024, 2000, -1023, -1074, -2000])
    got2 = np.asarray(pow2_int(jnp.asarray(es2)))
    assert np.array_equal(
        got2, np.array([2.0**min(max(e, -1022), 1023) for e in es2])
    )


def test_slice_operand_tiny_fibers_in_domain():
    """Fibers with max near the _TINY clamp keep all derived exponents in
    pow2_int's exact domain: slices reconstruct (up to the <2**-800
    residual) and no wrong scales appear (advisor finding)."""
    X = np.array([[2.0**-405, -(2.0**-420), 0.0, 2.0**-401],
                  [1.0, 2.0, 3.0, 4.0]])
    sl = slice_operand(jnp.asarray(X), -1, 21, 6)
    recon = np.sum([np.asarray(s) for s in sl], axis=0)
    assert np.all(np.isfinite(recon))
    assert np.allclose(recon, X, rtol=0, atol=2.0**-800)
    assert np.array_equal(recon[1], X[1])
