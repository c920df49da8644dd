"""Pallas single-kernel Jacobi eigensolver (ops/jacobi_pallas.py).

Runs in Pallas interpreter mode on CPU (the kernel itself is exercised, just
not Mosaic-compiled); the same code path compiles on TPU. Oracle:
numpy.linalg.eigh.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from loraine_tpu.ops.jacobi_pallas import (
    eig_bounds_pallas,
    eigh_pallas_f32,
    eigmin_pallas,
)
from loraine_tpu.ops.linalg import cho_solve_inv, tri_inv


@pytest.mark.parametrize("m,nb", [(6, 3), (16, 2), (23, 4), (56, 2)])
def test_eigh_pallas_seed_quality(m, nb):
    rng = np.random.default_rng(m * 7 + nb)
    A = rng.standard_normal((nb, m, m))
    A = (A + A.transpose(0, 2, 1)) / 2
    lam, V = eigh_pallas_f32(jnp.asarray(A), interpret=True)
    lam = np.asarray(lam, np.float64)
    V = np.asarray(V, np.float64)
    lam_ref = np.linalg.eigvalsh(A)
    scale = np.max(np.abs(lam_ref))
    assert np.max(np.abs(lam - lam_ref)) < 5e-5 * scale
    # reconstruction + orthogonality at f32 seed quality
    R = (V * lam[:, None, :]) @ V.transpose(0, 2, 1)
    assert np.max(np.abs(R - A)) < 1e-4 * scale
    assert np.max(np.abs(V.transpose(0, 2, 1) @ V - np.eye(m))) < 1e-4


def test_eigh_pallas_clustered_spectrum():
    # IPM-like: eigenvalues clustered at mu with a graded tail
    rng = np.random.default_rng(0)
    m, nb = 24, 2
    d = np.concatenate(
        [np.full((nb, m // 2), 1.0), 10.0 ** rng.uniform(-6, 0, (nb, m // 2))],
        axis=1,
    )
    Q = np.linalg.qr(rng.standard_normal((nb, m, m)))[0]
    A = Q @ (d[:, :, None] * np.eye(m)) @ Q.transpose(0, 2, 1)
    A = (A + A.transpose(0, 2, 1)) / 2
    lam, _ = eigh_pallas_f32(jnp.asarray(A), interpret=True)
    lam_ref = np.linalg.eigvalsh(A)
    assert np.max(np.abs(np.asarray(lam, np.float64) - lam_ref)) < 1e-4


@pytest.mark.parametrize("kind", ["random", "graded", "clustered", "psd"])
def test_eig_bounds_valid_and_tight(kind):
    rng = np.random.default_rng(hash(kind) % 2**32)
    m, nb = 40, 3
    if kind == "random":
        A = rng.standard_normal((nb, m, m))
        A = (A + A.transpose(0, 2, 1)) / 2
    else:
        if kind == "graded":
            d = 10.0 ** rng.uniform(-8, 2, (nb, m))
        elif kind == "clustered":
            d = 1.0 + 1e-7 * rng.standard_normal((nb, m))
            d[:, 0] = -0.25
        else:
            d = np.abs(rng.standard_normal((nb, m))) + 1e-3
        Q = np.linalg.qr(rng.standard_normal((nb, m, m)))[0]
        A = Q @ (d[:, :, None] * np.eye(m)) @ Q.transpose(0, 2, 1)
        A = (A + A.transpose(0, 2, 1)) / 2
    lo, hi = eig_bounds_pallas(jnp.asarray(A), interpret=True)
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    ev = np.linalg.eigvalsh(A)
    scale = np.max(np.sum(np.abs(A), axis=-1), axis=-1)
    # validity: lo <= lambda_min, hi >= lambda_max (the certified property)
    assert (lo <= ev[:, 0] + 1e-12).all()
    assert (hi >= ev[:, -1] - 1e-12).all()
    # tightness: within ~1e-4 of the margin-dominated expectation
    assert np.max((ev[:, 0] - lo) / scale) < 2e-4
    assert np.max((hi - ev[:, -1]) / scale) < 2e-4


def test_eigmin_pallas_matches_bounds():
    rng = np.random.default_rng(5)
    A = rng.standard_normal((2, 20, 20))
    A = (A + A.transpose(0, 2, 1)) / 2
    lo = eigmin_pallas(jnp.asarray(A), interpret=True)
    lo2, _ = eig_bounds_pallas(jnp.asarray(A), interpret=True)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(lo2))


@pytest.mark.parametrize("n", [16, 104, 128, 300, 513])
def test_tri_inv(n):
    rng = np.random.default_rng(n)
    A = rng.standard_normal((n, n))
    H = A @ A.T + n * np.eye(n)
    L = np.linalg.cholesky(H)
    Li = np.asarray(tri_inv(jnp.asarray(L)))
    assert np.max(np.abs(Li @ L - np.eye(n))) < 1e-13
    b = rng.standard_normal(n)
    x = np.asarray(cho_solve_inv(jnp.asarray(Li), jnp.asarray(b)))
    assert np.linalg.norm(H @ x - b) / np.linalg.norm(b) < 1e-12


def test_tri_inv_batched():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((3, 60, 60))
    H = A @ A.transpose(0, 2, 1) + 60 * np.eye(60)
    L = np.linalg.cholesky(H)
    Li = np.asarray(tri_inv(jnp.asarray(L)))
    assert np.max(np.abs(Li @ L - np.eye(60))) < 1e-13
