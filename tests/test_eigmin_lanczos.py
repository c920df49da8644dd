"""Certified Lanczos lambda_min lower bound (ops/eigh.eigmin_lanczos)."""
import numpy as np
import jax.numpy as jnp

import loraine_tpu as lt
from loraine_tpu.ops.eigh import eigmin_lanczos

rng = np.random.default_rng(11)


def test_bound_is_certified_and_tight():
    for m, nb in [(17, 4), (31, 3), (56, 2), (120, 2)]:
        A = rng.standard_normal((nb, m, m))
        M = (A + A.transpose(0, 2, 1)) / 2
        lo = np.asarray(eigmin_lanczos(jnp.asarray(M)))
        true = np.linalg.eigvalsh(M)[:, 0]
        slack = true - lo
        assert np.all(slack >= -1e-10), (m, slack)  # never above the truth
        assert np.all(slack <= 1e-5 * np.abs(true) + 1e-6), (m, slack)


def test_graded_spectrum_ipm_regime():
    # the steplength matrices have graded spectra; the bound must be tight
    # there even at large m
    m = 400
    Q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    lam = -np.logspace(-6, 0, m)
    M = (Q * lam) @ Q.T
    M = (M + M.T) / 2
    lo = float(eigmin_lanczos(jnp.asarray(M[None]))[0])
    true = float(np.linalg.eigvalsh(M)[0])
    assert lo <= true + 1e-12
    assert true - lo <= 1e-6 * abs(true)


def test_psd_case_returns_near_zero_or_positive_bound():
    m = 64
    A = rng.standard_normal((2, m, m))
    M = A @ A.transpose(0, 2, 1) + 0.1 * np.eye(m)
    lo = np.asarray(eigmin_lanczos(jnp.asarray(M)))
    true = np.linalg.eigvalsh(M)[:, 0]
    assert np.all(lo <= true + 1e-10)
    assert np.all(lo > 0)  # strictly PD input certifies PD


def test_e2e_lanczos_steplengths(data_dir):
    r = lt.solve_sdpa(
        str(data_dir / "theta1.dat-s"),
        {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0,
         "step_eig": "lanczos"},
    )
    assert r.status == 1
    assert abs(r.objective - 23.0) < 1e-4
