"""Fused Pallas PCG (ops/pcg_pallas.py) vs the XLA-loop PCG oracle.

Same operator + preconditioner as the materialized CG path
(`src/predictor_corrector.jl:118-140` call sites); the kernel runs in
interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import loraine_tpu as lt
from loraine_tpu.ops.cg import pcg
from loraine_tpu.ops.pcg_pallas import pcg_pallas_mixed


def _sys(n, cond, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.logspace(0, -np.log10(cond), n)
    H = jnp.asarray(Q @ np.diag(lam) @ Q.T, jnp.float64)
    b = jnp.asarray(rng.standard_normal(n), jnp.float64)
    return H, b


@pytest.mark.parametrize("n", [21, 104, 300])
@pytest.mark.parametrize("cond", [1e1, 1e3])
def test_pcg_pallas_matches_xla(n, cond):
    # identity preconditioner: supported only while kappa(H) keeps the f32
    # inner floor (~u32 * kappa per refinement pass) below the tolerance —
    # the production auto-gate requires the H_alpha preconditioner for the
    # ill-conditioned regime (see test_pcg_pallas_preconditioned)
    H, b = _sys(n, cond, seed=n)
    Mli = jnp.eye(n, dtype=jnp.float64)
    tol = jnp.asarray(1e-10, jnp.float64)
    x_ref, _ = pcg(lambda v: H @ v, b, lambda v: v, tol, 5000)
    x, its = pcg_pallas_mixed(H, Mli, b, tol, 5000)
    r = jnp.linalg.norm(b - H @ x) / jnp.linalg.norm(b)
    assert float(r) <= 1e-10
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-8)
    assert int(its) > 0


def test_pcg_pallas_preconditioned():
    # H_alpha-like: precondition with the inverse Cholesky factor of a
    # nearby matrix -> few CG iterations, f64-tight final residual
    n = 64
    H, b = _sys(n, 1e8, seed=3)
    M = H + 1e-6 * jnp.eye(n, dtype=jnp.float64)
    L = jnp.linalg.cholesky(M)
    Mli = jax.scipy.linalg.solve_triangular(L, jnp.eye(n, dtype=jnp.float64), lower=True)
    tol = jnp.asarray(1e-9, jnp.float64)
    x, its = pcg_pallas_mixed(H, Mli, b, tol, 2000)
    r = jnp.linalg.norm(b - H @ x) / jnp.linalg.norm(b)
    assert float(r) <= 1e-9


def test_pcg_pallas_converged_rhs_is_free():
    # an already-converged pass must exit without iterating
    n = 32
    H, b = _sys(n, 1e2, seed=5)
    Mli = jnp.eye(n, dtype=jnp.float64)
    x, its = pcg_pallas_mixed(H, Mli, b * 0.0, jnp.asarray(1e-8, jnp.float64), 100)
    assert int(its) == 0
    assert float(jnp.max(jnp.abs(x))) == 0.0


def test_control1_e2e_with_pallas_cg_loose(data_dir):
    # e2e at the kernel's supported regime: LOOSE tolerances. Near IPM
    # convergence kappa(Mli H Mli^T) was measured at 7e9-1e10 on control1
    # (H_alpha does not bound the preconditioned spectrum as mu -> 0), where
    # the f32 body's per-pass residual floor (~u32 * kappa) stalls and the
    # f64 cast of Hp even goes indefinite — so 'pallas' is opt-in for
    # loose-tolerance solves and 'auto' keeps the f64 CG (step.py routes
    # the materialized path through cg_plain on the split system instead).
    r = lt.solve_sdpa(
        str(data_dir / "control1.dat-s"),
        {"kit": 1, "preconditioner": 1, "eDIMACS": 3e-3, "tol_cg_min": 1e-4,
         "initpoint": 1, "verb": 0, "cg_kernel": "pallas", "maxit": 40},
    )
    assert r.status == 1
    np.testing.assert_allclose(r.objective, 17.7846, rtol=1e-3)


# ---------------------------------------------------------------------------
# float-float kernel (pcg_pallas_ff). On CPU the interpret path degrades to
# ~f32 body accuracy (XLA:CPU contracts the error-free transforms — see the
# module comment in ops/pcg_pallas.py), so CPU tests exercise trajectory,
# stopping, and refinement behavior at moderate conditioning; the ~2^-47
# body precision (the reason the kernel exists) is asserted by the
# TPU-only exactness probe below and by the on-TPU bench.
# ---------------------------------------------------------------------------
from loraine_tpu.ops.pcg_pallas import pcg_pallas_ff  # noqa: E402


@pytest.mark.parametrize("n", [21, 104, 300])
@pytest.mark.parametrize("cond", [1e1, 1e3])
def test_pcg_pallas_ff_matches_xla(n, cond):
    # CPU-regime contract (interpret path, ~f32 body): converge to the
    # requested tolerance and land near the f64 CG solution. On TPU the
    # same call meets f64-tight tolerances (ff body is ~2^-47-exact there,
    # see test_ff_eft_exactness_on_tpu).
    H, b = _sys(n, cond, seed=n)
    Mli = jnp.eye(n, dtype=jnp.float64)
    tol = jnp.asarray(1e-6, jnp.float64)
    x_ref, _ = pcg(lambda v: H @ v, b, lambda v: v, tol, 5000)
    x, its = pcg_pallas_ff(H, Mli, b, tol, 5000)
    r = jnp.linalg.norm(b - H @ x) / jnp.linalg.norm(b)
    assert float(r) <= 1e-5
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               atol=1e-4 * float(jnp.linalg.norm(x_ref)))
    assert int(its) > 0


def test_pcg_pallas_ff_never_worsens():
    # hopeless regime on the CPU interpret path (kappa far beyond the f32
    # body): the refinement guard must reject bad updates — returned x can
    # be no worse than x = 0
    n = 200
    H, b = _sys(n, 1e8, seed=3)
    x, its = pcg_pallas_ff(H, jnp.eye(n, dtype=jnp.float64), b,
                           jnp.asarray(1e-6, jnp.float64), 10000)
    r = jnp.linalg.norm(b - H @ x) / jnp.linalg.norm(b)
    assert float(r) <= 1.0 + 1e-12
    assert bool(jnp.all(jnp.isfinite(x)))


def test_pcg_pallas_ff_converged_rhs_is_free():
    n = 32
    H, b = _sys(n, 1e2, seed=5)
    Mli = jnp.eye(n, dtype=jnp.float64)
    x, its = pcg_pallas_ff(H, Mli, b * 0.0, jnp.asarray(1e-8, jnp.float64), 100)
    assert int(its) == 0
    assert float(jnp.max(jnp.abs(x))) == 0.0


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="ff exactness requires Mosaic's 1:1 float lowering; XLA:CPU "
    "contracts the error-free transforms (measured, see ops/pcg_pallas.py)",
)
def test_ff_eft_exactness_on_tpu():
    """On-device probe: the Mosaic-lowered ff multiply of a broadcast ff
    scalar against an ff vector must be ~2^-47-exact (this is exactly the
    pattern XLA:CPU miscompiles to u32-level)."""
    from jax.experimental import pallas as pl

    from loraine_tpu.ops.pcg_pallas import _LANES, _ff_mul, _to_ff

    rng = np.random.default_rng(3)
    n = 8
    p64 = rng.standard_normal(n)
    s64 = float(rng.standard_normal())
    ah64, al64 = _to_ff(jnp.asarray(np.full(1, s64)))
    ph64, pl64 = _to_ff(jnp.asarray(p64))
    ah = jnp.broadcast_to(ah64[:, None], (1, _LANES)).astype(jnp.float32)
    al = jnp.broadcast_to(al64[:, None], (1, _LANES)).astype(jnp.float32)
    ph = jnp.broadcast_to(ph64[:, None], (n, _LANES)).astype(jnp.float32)
    plo = jnp.broadcast_to(pl64[:, None], (n, _LANES)).astype(jnp.float32)

    def kern(a_h, a_l, p_h, p_l, oh, ol):
        th, tl = _ff_mul(a_h[...], a_l[...], p_h[...], p_l[...])
        oh[...] = th
        ol[...] = tl

    with jax.enable_x64(False):
        oh, ol = pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((n, _LANES), jnp.float32),) * 2,
        )(ah, al, ph, plo)
    got = np.asarray(oh[:, 0], np.float64) + np.asarray(ol[:, 0], np.float64)
    err = np.abs(got - s64 * p64).max()
    assert err < 1e-13, f"Mosaic ff_mul error {err:.3e} above ff class"
