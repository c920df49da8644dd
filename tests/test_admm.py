"""ADMM (boundary-point) solver: reference `TBD/admm_sdp.jl` parity."""
import numpy as np

import loraine_tpu as lt
from loraine_tpu.ipm.admm import solve_admm


def test_admm_theta1(data_dir):
    prob = lt.problem_from_sdpa(str(data_dir / "theta1.dat-s"))
    res = solve_admm(prob, eps=1e-5, maxiter=20000, verb=0, chunk=1000)
    assert res.status == 1
    np.testing.assert_allclose(res.objective, 23.0, rtol=1e-4)
    assert res.X[0].shape == (50, 50)
    # projection keeps S PSD
    w = np.linalg.eigvalsh(res.S[0])
    assert w.min() > -1e-9


def test_admm_with_lp_cone():
    rng = np.random.default_rng(3)
    n = 8
    A = rng.standard_normal((n, 6, 6))
    A = (A + A.transpose(0, 2, 1)) / 2
    C = rng.standard_normal((6, 6))
    C = C @ C.T + 6 * np.eye(6)
    C_lin = rng.standard_normal((n, 4))
    d_lin = np.abs(rng.standard_normal(4)) + 1.0
    b = rng.standard_normal(n)
    prob = lt.problem_from_dense([A], [C], b, C_lin=C_lin, d_lin=d_lin)
    ipm = lt.solve(prob, {"verb": 0, "eDIMACS": 1e-8})
    adm = solve_admm(prob, eps=1e-7, maxiter=50000, verb=0, chunk=2000)
    assert adm.status == 1
    np.testing.assert_allclose(adm.objective, ipm.objective, rtol=1e-4, atol=1e-5)


def test_admm_warm_starts_ipm(data_dir):
    # use a coarse ADMM solution to warm-start the IPM: X/S from ADMM are on
    # the PSD boundary, so push them inside before handing over
    import jax.numpy as jnp

    prob = lt.problem_from_sdpa(str(data_dir / "theta1.dat-s"))
    adm = solve_admm(prob, eps=1e-3, maxiter=5000, verb=0, chunk=1000)
    shift = 1e-2
    state = lt.IPMState(
        X=tuple(
            jnp.asarray(np.stack([X + shift * np.eye(g.m) for X in [
                np.pad(adm.X[i], ((0, g.m - adm.X[i].shape[0]),) * 2)
                + np.diag(np.r_[np.zeros(adm.X[i].shape[0]), np.ones(g.m - adm.X[i].shape[0])] * 0.1)
                for i in g.orig_indices
            ]]))
            for g in prob.groups
        ),
        S=tuple(
            jnp.asarray(np.stack([S + shift * np.eye(g.m) for S in [
                np.pad(adm.S[i], ((0, g.m - adm.S[i].shape[0]),) * 2)
                + np.diag(np.r_[np.zeros(adm.S[i].shape[0]), np.ones(g.m - adm.S[i].shape[0])])
                for i in g.orig_indices
            ]]))
            for g in prob.groups
        ),
        y=jnp.asarray(adm.y),
        X_lin=None,
        S_lin=None,
        sigma=jnp.asarray(3.0),
    )
    res = lt.Solver(prob, lt.Options(eDIMACS=1e-6, verb=0), initial_state=state).solve()
    assert res.status == 1
    np.testing.assert_allclose(res.objective, 23.0, rtol=1e-6)
