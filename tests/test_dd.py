"""Unit tests for double-double primitives (ops/dd.py).

Oracle: exact rational arithmetic (fractions.Fraction) — every f64 is an
exact rational, so sums/dots/matvecs have exact reference values, letting
us verify the ~2^-100 accuracy class that longdouble (64-bit mantissa)
cannot resolve."""
from fractions import Fraction

import numpy as np
import jax.numpy as jnp
import pytest

from loraine_tpu.ops.dd import (
    DD,
    dd_add,
    dd_dot,
    dd_matvec,
    dd_sum,
    dd_to_f64,
    two_prod,
    two_sum,
)

rng = np.random.default_rng(0)


def _exact_dot(a, b):
    return sum(
        (Fraction(float(x)) * Fraction(float(y)) for x, y in zip(a, b)),
        Fraction(0),
    )


def _dd_frac(d: DD, idx=()):
    hi = np.asarray(d.hi)[idx] if idx else np.asarray(d.hi)
    lo = np.asarray(d.lo)[idx] if idx else np.asarray(d.lo)
    return Fraction(float(hi)) + Fraction(float(lo))


def test_two_sum_exact():
    a = jnp.asarray([1.0, 1e16, 1.0, -1e-30])
    b = jnp.asarray([2.0**-60, 1.0, -1.0, 1e-30])
    s = two_sum(a, b)
    for i in range(4):
        got = Fraction(float(s.hi[i])) + Fraction(float(s.lo[i]))
        assert got == Fraction(float(a[i])) + Fraction(float(b[i]))


def test_two_prod_exact():
    a = rng.standard_normal(64) * np.exp(rng.uniform(-20, 20, 64))
    b = rng.standard_normal(64) * np.exp(rng.uniform(-20, 20, 64))
    p = two_prod(jnp.asarray(a), jnp.asarray(b))
    for i in range(64):
        got = Fraction(float(p.hi[i])) + Fraction(float(p.lo[i]))
        assert got == Fraction(float(a[i])) * Fraction(float(b[i]))


def test_dd_sum_cancellation():
    # sum of [1, u, -1, tiny]: plain f64 returns u exactly here, but dd must
    # keep the 2^-80 term too
    x = jnp.asarray([1.0, 2.0**-53, -1.0, 2.0**-80])
    s = dd_sum(DD(x, jnp.zeros_like(x)))
    exact = Fraction(2) ** -53 + Fraction(2) ** -80
    assert abs(_dd_frac(s) - exact) <= exact * Fraction(1, 10**20)


@pytest.mark.parametrize("n", [3, 64, 1000])
def test_dd_dot_ill_conditioned(n):
    # Heavy cancellation: pairs (v, -v) plus a tiny remainder; plain f64
    # loses everything, dd recovers the 1e-12 answer to ~20+ digits.
    r = np.random.default_rng(42 + n)
    v = r.standard_normal(n) * 1e8
    a = np.concatenate([v, -v, [1.0]])
    b = np.concatenate([np.ones(n), np.ones(n), [1e-12]])
    perm = r.permutation(a.size)
    a, b = a[perm], b[perm]
    d = dd_dot(jnp.asarray(a), jnp.asarray(b))
    exact = _exact_dot(a, b)  # == 1e-12 as a rational
    err = abs(_dd_frac(d) - exact)
    # dd keeps ~2^-105 relative to the INTERMEDIATE magnitudes (~1e8 here),
    # i.e. absolute ~1e-24 — versus f64's ~1e-8 on the same data
    assert err <= Fraction(1, 10**22)
    plain_err = abs(Fraction(float(np.dot(a, b))) - exact)
    assert plain_err >= err  # f64 is never better


def test_dd_dot_batched_shape_and_accuracy():
    a = rng.standard_normal((5, 7, 33))
    b = rng.standard_normal((5, 7, 33))
    d = dd_dot(jnp.asarray(a), jnp.asarray(b))
    assert d.hi.shape == (5, 7)
    for i, j in [(0, 0), (2, 3), (4, 6)]:
        exact = _exact_dot(a[i, j], b[i, j])
        err = abs(_dd_frac(d, (i, j)) - exact)
        assert err <= abs(exact) * Fraction(1, 10**28) + Fraction(1, 10**30)


def test_dd_matvec_accuracy():
    H = rng.standard_normal((40, 40))
    H = H @ H.T + 1e-12 * np.eye(40)
    x = rng.standard_normal(40)
    d = dd_matvec(jnp.asarray(H), jnp.asarray(x))
    for r in [0, 17, 39]:
        exact = _exact_dot(H[r], x)
        err = abs(_dd_frac(d, (r,)) - exact)
        assert err <= abs(exact) * Fraction(1, 10**28) + Fraction(1, 10**30)


def test_dd_add_running_accumulation():
    xs = rng.standard_normal(100) * np.exp(rng.uniform(-30, 30, 100))
    acc = DD(jnp.asarray(0.0), jnp.asarray(0.0))
    for v in xs:
        acc = dd_add(acc, DD(jnp.asarray(float(v)), jnp.asarray(0.0)))
    exact = sum((Fraction(float(v)) for v in xs), Fraction(0))
    err = abs(_dd_frac(acc) - exact)
    assert err <= abs(exact) * Fraction(1, 10**25)
    assert np.isclose(float(dd_to_f64(acc)), float(exact))


def test_dd_requires_f64():
    """Option-surface validation (cheap; lives here so the default suite
    covers it — the e2e dd solves are tests/test_precision.py, marked slow)."""
    import loraine_tpu as lt
    import pytest
    with pytest.raises(ValueError):
        lt.Options(precision="dd", dtype="float32").validated()
    # dd is supported on BOTH paths (reference runs Float64xN through its
    # CG too, src/predictor_corrector.jl:131-134) — kit=1 must survive
    o = lt.Options(precision="dd", kit=1).validated()
    assert o.kit == 1
    with pytest.raises(ValueError):
        lt.Options(precision="qd").validated()
