"""Mixed-precision blocked Cholesky (ops/mixed_chol.py) vs the f64 oracle.

The mixed path must be a drop-in for `chol_blocked` inside `chol_reg`
(`src/prepare_W.jl:5-26` / `src/predictor_corrector.jl:55-97` semantics):
same factor up to f64 roundoff on the conditioning range it accepts, f64
fallback above it, NaN propagation for indefinite input.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loraine_tpu.ops.linalg import chol_reg
from loraine_tpu.ops.mixed_chol import chol_mixed_blocked, panel_chol_mixed


def _spd(n, cond, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.logspace(0, -np.log10(cond), n)
    return jnp.asarray(Q @ np.diag(lam) @ Q.T, jnp.float64)


@pytest.mark.parametrize("n", [64, 128, 200, 333])
@pytest.mark.parametrize("cond", [1e2, 1e6, 1e10, 1e14])
def test_mixed_chol_matches_f64(n, cond):
    M = _spd(n, cond, seed=n)
    L = chol_mixed_blocked(M)
    assert not bool(jnp.isnan(L).any())
    resid = jnp.linalg.norm(M - L @ L.T) / jnp.linalg.norm(M)
    # f64-class backward error at every conditioning (the per-panel
    # fallback covers what the f32 seed + Newton refinement cannot)
    assert float(resid) < 1e-13, (n, cond, float(resid))
    # lower-triangular
    assert float(jnp.max(jnp.abs(jnp.triu(L, 1)))) == 0.0


def test_mixed_chol_batched():
    Ms = jnp.stack([_spd(96, 1e4, seed=i) for i in range(3)])
    L = chol_mixed_blocked(Ms)
    resid = jnp.linalg.norm(Ms - L @ jnp.swapaxes(L, -1, -2)) / jnp.linalg.norm(Ms)
    assert float(resid) < 1e-13


def test_mixed_chol_indefinite_nan():
    M = _spd(128, 1e3, seed=7)
    M = M - 2.0 * float(jnp.linalg.norm(M, 2)) * jnp.eye(128, dtype=jnp.float64)
    L = chol_mixed_blocked(M)
    assert bool(jnp.isnan(L).any())


def test_chol_reg_mixed_backend_shift_semantics():
    # indefinite input must be shifted the same number of times as the f64
    # backend (NaN-keyed retry loop unchanged)
    M = _spd(160, 1e6, seed=3) - 1.5e-4 * jnp.eye(160, dtype=jnp.float64)
    r64 = chol_reg(M, 1e-4, 10, backend="f64")
    rmx = chol_reg(M, 1e-4, 10, backend="mixed")
    assert int(r64.shifts) == int(rmx.shifts) > 0
    assert bool(r64.ok) and bool(rmx.ok)
    np.testing.assert_allclose(np.asarray(rmx.L), np.asarray(r64.L), atol=1e-10)


def test_panel_inverse_accuracy():
    M = _spd(128, 1e8, seed=11)
    L, Li = panel_chol_mixed(M)
    n = M.shape[-1]
    err = jnp.linalg.norm(Li @ L - jnp.eye(n, dtype=jnp.float64))
    assert float(err) < 1e-11

    # jit-compatible (the step traces it inside lax.cond)
    Lj, _ = jax.jit(panel_chol_mixed)(M)
    np.testing.assert_allclose(np.asarray(Lj), np.asarray(L), rtol=1e-12)
