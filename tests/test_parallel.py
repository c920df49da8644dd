"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY section 4: distributed tests without a pod)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import loraine_tpu as lt
from loraine_tpu.ipm.initial import initial_point
from loraine_tpu.ipm.step import build_step
from loraine_tpu.parallel.mesh import auto_mesh, make_mesh, shard_problem, shard_state


def _multiblock_problem():
    rng = np.random.default_rng(0)
    nb, n, m, nlin = 4, 16, 8, 4
    As, Cs = [], []
    for _ in range(nb):
        A = rng.standard_normal((n, m, m))
        As.append((A + A.transpose(0, 2, 1)) / 2)
        C = rng.standard_normal((m, m))
        Cs.append(C @ C.T + m * np.eye(m))
    b = rng.standard_normal(n)
    C_lin = rng.standard_normal((n, nlin))
    d_lin = np.abs(rng.standard_normal(nlin)) + 1.0
    return lt.problem_from_dense(As, Cs, b, C_lin=C_lin, d_lin=d_lin)


def test_sharded_step_matches_single_device():
    problem = _multiblock_problem()
    opts = lt.Options(kit=0, verb=0).validated()
    state = initial_point(problem, opts)
    step = jax.jit(build_step(opts, -1))
    tol = jnp.asarray(1e-2, dtype=problem.b.dtype)

    ref_state, ref_stats = step(problem, state, tol)

    mesh = make_mesh((2, 4))
    sp = shard_problem(problem, mesh)
    ss = shard_state(state, problem, mesh)
    out_state, out_stats = step(sp, ss, tol)

    np.testing.assert_allclose(
        np.asarray(out_state.y), np.asarray(ref_state.y), rtol=1e-9, atol=1e-10
    )
    for Xr, Xs in zip(ref_state.X, out_state.X):
        np.testing.assert_allclose(np.asarray(Xs), np.asarray(Xr), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(float(out_stats.dimacs), float(ref_stats.dimacs), rtol=1e-8)


def test_sharded_full_solve():
    problem = _multiblock_problem()
    mesh = auto_mesh(problem)
    sp = shard_problem(problem, mesh)
    res = lt.solve(sp, {"kit": 0, "eDIMACS": 1e-7, "verb": 0})
    res_ref = lt.solve(problem, {"kit": 0, "eDIMACS": 1e-7, "verb": 0})
    assert res.status == res_ref.status == 1
    np.testing.assert_allclose(res.objective, res_ref.objective, rtol=1e-8)


def test_auto_mesh_shape():
    problem = _multiblock_problem()
    mesh = auto_mesh(problem)
    assert mesh.shape["blocks"] * mesh.shape["schur"] == len(jax.devices())


def test_sharded_sparse_storage_matches():
    rng = np.random.default_rng(4)
    nb, n, m = 4, 16, 8
    As = []
    for _ in range(nb):
        A = np.zeros((n, m, m))
        for j in range(n):
            r, c = rng.integers(0, m, 2)
            v = rng.standard_normal()
            A[j, r, c] += v
            A[j, c, r] += v * (r != c)
        As.append(A)
    Cs = [np.eye(m) * (m + i) for i in range(nb)]
    b = rng.standard_normal(n)
    problem = lt.problem_from_dense(As, Cs, b, storage="sparse")
    assert all(g.is_sparse for g in problem.groups)

    res_ref = lt.solve(problem, {"kit": 0, "eDIMACS": 1e-7, "verb": 0})
    mesh = make_mesh((2, 4))
    res_sh = lt.solve(shard_problem(problem, mesh), {"kit": 0, "eDIMACS": 1e-7, "verb": 0})
    assert res_ref.status == res_sh.status == 1
    np.testing.assert_allclose(res_sh.objective, res_ref.objective, rtol=1e-8)


def test_sharded_initpoint1_preserves_group_norms():
    """shard_problem must carry the host-side data_norms/C_norms metadata:
    initpoint=1 sizes X/S from them (regression: they were dropped, giving
    zero-size state arrays)."""
    problem = _multiblock_problem()
    mesh = make_mesh((2, 4))
    sp = shard_problem(problem, mesh)
    for g, gs in zip(problem.groups, sp.groups):
        assert gs.data_norms == g.data_norms
        assert gs.C_norms == g.C_norms
    res = lt.solve(sp, {"kit": 0, "eDIMACS": 1e-7, "initpoint": 1, "verb": 0})
    ref = lt.solve(problem, {"kit": 0, "eDIMACS": 1e-7, "initpoint": 1, "verb": 0})
    assert res.status == ref.status == 1
    np.testing.assert_allclose(res.objective, ref.objective, rtol=1e-8)


def _dense_noLP_problem():
    rng = np.random.default_rng(7)
    nb, n, m = 4, 12, 6
    As, Cs = [], []
    for _ in range(nb):
        A = rng.standard_normal((n, m, m))
        As.append((A + A.transpose(0, 2, 1)) / 2)
        C = rng.standard_normal((m, m))
        Cs.append(C @ C.T + m * np.eye(m))
    b = rng.standard_normal(n)
    return lt.problem_from_dense(As, Cs, b, storage="dense")


def test_shard_state_preserves_dd2_tails():
    """Resharding a dd2 state must carry the X_lo/S_lo/y_lo tails (ADVICE r3:
    they were silently dropped, degrading the iterate to dd-class)."""
    problem = _dense_noLP_problem()
    opts = lt.Options(kit=0, verb=0, precision="dd2", datasparsity=0).validated()
    state = initial_point(problem, opts)
    assert state.X_lo is not None
    mesh = make_mesh((2, 4))
    ss = shard_state(state, problem, mesh)
    assert ss.X_lo is not None and ss.S_lo is not None and ss.y_lo is not None
    for lo_ref, lo_sh in zip(state.X_lo, ss.X_lo):
        np.testing.assert_array_equal(np.asarray(lo_sh), np.asarray(lo_ref))
    np.testing.assert_array_equal(np.asarray(ss.y_lo), np.asarray(state.y_lo))


@pytest.mark.slow
def test_sharded_dd2_step_matches_single_device():
    """One dd2 step sharded == unsharded (slow: dd2 chunk-class compile)."""
    problem = _dense_noLP_problem()
    opts = lt.Options(kit=0, verb=0, precision="dd2", datasparsity=0).validated()
    state = initial_point(problem, opts)
    step = jax.jit(build_step(opts, -1))
    tol = jnp.asarray(1e-2, dtype=problem.b.dtype)
    ref_state, ref_stats = step(problem, state, tol)

    mesh = make_mesh((2, 4))
    sp = shard_problem(problem, mesh)
    ss = shard_state(state, problem, mesh)
    out_state, out_stats = step(sp, ss, tol)

    np.testing.assert_allclose(
        np.asarray(out_state.y), np.asarray(ref_state.y), rtol=1e-9, atol=1e-10
    )
    assert out_state.X_lo is not None
    for Xr, Xs in zip(ref_state.X, out_state.X):
        np.testing.assert_allclose(np.asarray(Xs), np.asarray(Xr), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(float(out_stats.dimacs), float(ref_stats.dimacs), rtol=1e-8)


def test_sharded_full_solve_kit1_halpha():
    """Iterative path (kit=1, CG + H_alpha) sharded == single-device — the
    round-1 sharded tests were all kit=0 (VERDICT round 1, item 5)."""
    problem = _multiblock_problem()
    opts = {"kit": 1, "preconditioner": 1, "eDIMACS": 1e-5,
            "tol_cg_min": 1e-6, "verb": 0}
    ref = lt.solve(problem, dict(opts))
    mesh = make_mesh((2, 4))
    res = lt.solve(shard_problem(problem, mesh), dict(opts))
    assert ref.status == res.status == 1
    # sharded reductions round differently, so the two CG trajectories stop
    # at different points inside the eDIMACS=1e-5 band; only agreement at
    # the solve tolerance is guaranteed, not bitwise trajectory identity
    np.testing.assert_allclose(res.objective, ref.objective, rtol=2e-6)
