"""NT scaling identities against the defining equations
(reference formulas `src/prepare_W.jl:28-83`):
  G G^T = W,  G^T S G = diag(D),  G^{-1} X G^{-T} = diag(D),  W S W = X.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loraine_tpu.ops.nt_scaling import nt_scale


def _random_spd(key, nb, m, scale=1.0):
    a = jax.random.normal(key, (nb, m, m), dtype=jnp.float64)
    return a @ jnp.swapaxes(a, -1, -2) + scale * jnp.eye(m, dtype=jnp.float64)


@pytest.mark.parametrize("nb,m", [(1, 8), (3, 16), (5, 5)])
def test_nt_identities(nb, m):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    X = _random_spd(k1, nb, m, 0.5)
    S = _random_spd(k2, nb, m, 0.7)
    nt = nt_scale(X, S)
    assert bool(nt.ok)

    GT = jnp.swapaxes(nt.G, -1, -2)
    np.testing.assert_allclose(nt.G @ GT, nt.W, rtol=1e-9, atol=1e-9)
    D = jax.vmap(jnp.diag)(nt.D)
    np.testing.assert_allclose(GT @ S @ nt.G, D, rtol=1e-8, atol=1e-8)
    GiT = jnp.swapaxes(nt.Gi, -1, -2)
    np.testing.assert_allclose(nt.Gi @ X @ GiT, D, rtol=1e-8, atol=1e-8)
    # NT defining property
    np.testing.assert_allclose(nt.W @ S @ nt.W, X, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(nt.Si @ S, jnp.broadcast_to(jnp.eye(m, dtype=jnp.float64), S.shape), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(nt.DDsi, 1.0 / jnp.sqrt(nt.D), rtol=1e-7)
    np.testing.assert_allclose(nt.Gi @ nt.G, jnp.broadcast_to(jnp.eye(m, dtype=jnp.float64), S.shape), atol=1e-8)


def test_chol_regularization_recovers():
    # a slightly indefinite matrix gets shifted, not NaN
    M = jnp.diag(jnp.array([1.0, -1e-7, 2.0], dtype=jnp.float64))[None]
    from loraine_tpu.ops.linalg import chol_reg

    res = chol_reg(M, 1e-5, 100)
    assert bool(res.ok)
    assert not np.any(np.isnan(np.asarray(res.L)))
    assert int(res.shifts) >= 1


def test_eigmin_chol_bound():
    from loraine_tpu.ops.linalg import eigmin, eigmin_chol

    key = jax.random.PRNGKey(5)
    M = jax.random.normal(key, (4, 12, 12), dtype=jnp.float64)
    M = (M + jnp.swapaxes(M, -1, -2)) / 2
    exact = np.asarray(eigmin(M))
    bound = np.asarray(eigmin_chol(M))
    # lower bound, tight to ~1e-10 relative
    assert np.all(bound <= exact + 1e-12)
    np.testing.assert_allclose(bound, exact, rtol=1e-8, atol=1e-10)


def test_step_eig_chol_e2e():
    import loraine_tpu as lt

    ref = lt.solve_sdpa(
        "tests/data/theta1.dat-s",
        {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0},
    )
    res = lt.solve_sdpa(
        "tests/data/theta1.dat-s",
        {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0, "step_eig": "chol"},
    )
    assert res.status == 1
    np.testing.assert_allclose(res.objective, ref.objective, rtol=1e-6)
    assert abs(res.iterations - ref.iterations) <= 1
