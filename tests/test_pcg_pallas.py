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
