"""Iterative-path (kit=1) coverage: preconditioners across mixed block
groups and the LP cone (the dense AAAATtau branch of H_alpha), CG operator
vs explicit Schur matrix, hybrid switching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import loraine_tpu as lt
from loraine_tpu.ipm.initial import initial_point
from loraine_tpu.ops.nt_scaling import nt_scale
from loraine_tpu.ops.schur import Aadj, Aop, lp_weight, schur_group, schur_lp


def _mixed_problem(seed=0, with_lp=True):
    rng = np.random.default_rng(seed)
    n = 12
    As, Cs = [], []
    for m in (6, 6, 12):  # two groups after bucketing (pad_multiple=8 -> 8, 16)
        A = rng.standard_normal((n, m, m))
        As.append((A + A.transpose(0, 2, 1)) / 2)
        C = rng.standard_normal((m, m))
        Cs.append(C @ C.T + m * np.eye(m))
    C_lin = rng.standard_normal((n, 5)) if with_lp else None
    d_lin = (np.abs(rng.standard_normal(5)) + 1.0) if with_lp else None
    b = rng.standard_normal(n)
    return lt.problem_from_dense(As, Cs, b, C_lin=C_lin, d_lin=d_lin)


@pytest.mark.parametrize("prec", [0, 1, 2, 4])
def test_iterative_matches_direct_mixed_lp(prec):
    # random SDPs have full-rank solutions, where H_alpha (erank=1) is a poor
    # late-stage preconditioner — the reference docs recommend loosening
    # eDIMACS to 1e-5 for the iterative solver (docs/options.md); the
    # low-rank-solution case below tightens it
    prob = _mixed_problem()
    res_dir = lt.solve(prob, {"kit": 0, "eDIMACS": 1e-7, "verb": 0})
    res_it = lt.solve(
        prob,
        {
            "kit": 1, "preconditioner": prec, "eDIMACS": 1e-5,
            "tol_cg_min": 1e-7, "erank": 1, "verb": 0,
        },
    )
    assert res_dir.status == 1 and res_it.status == 1
    np.testing.assert_allclose(res_it.objective, res_dir.objective, rtol=1e-4)


def test_alpha_on_low_rank_solution():
    # max-cut relaxation of a bipartite graph: X* is exactly rank one, the
    # regime H_alpha is built for (docs/src/low-rank_solutions.md)
    from loraine_tpu.models import maxcut_problem

    W = np.zeros((8, 8))
    for i in range(4):
        for j in range(4, 8):
            W[i, j] = W[j, i] = 1.0
    prob = maxcut_problem(W)
    res = lt.solve(
        prob,
        {
            "kit": 1, "preconditioner": 1, "erank": 1,
            "eDIMACS": 1e-6, "tol_cg_min": 1e-7, "initpoint": 1, "verb": 0,
        },
    )
    assert res.status == 1
    np.testing.assert_allclose(res.objective, 16.0, rtol=1e-5)  # cut = all 16 edges


def test_cg_operator_matches_schur_matrix():
    prob = _mixed_problem()
    opts = lt.Options(verb=0).validated()
    st = initial_point(prob, opts)
    nts = tuple(nt_scale(X, S) for X, S in zip(st.X, st.S))
    lpw = lp_weight(st.X_lin, 1.0 / st.S_lin)

    H = jnp.zeros((prob.n, prob.n), dtype=prob.b.dtype)
    for g, nt in zip(prob.groups, nts):
        H = H + schur_group(g, nt.W, nt.G)
    H = H + schur_lp(prob.C_lin, lpw)

    def matvec(x):
        r = jnp.zeros_like(x)
        for g, nt in zip(prob.groups, nts):
            r = r + Aop(g, nt.W @ Aadj(g, x) @ nt.W)
        return r + prob.C_lin @ (lpw * (prob.C_lin.T @ x))

    x = jnp.asarray(np.random.default_rng(1).standard_normal(prob.n))
    np.testing.assert_allclose(np.asarray(matvec(x)), np.asarray(H @ x), rtol=1e-9)


def test_alpha_precond_beats_none_in_cg_iters():
    prob = _mixed_problem(seed=3)
    res_none = lt.solve(
        prob, {"kit": 1, "preconditioner": 0, "eDIMACS": 1e-6, "tol_cg_min": 1e-7, "verb": 0}
    )
    res_alpha = lt.solve(
        prob, {"kit": 1, "preconditioner": 1, "eDIMACS": 1e-6, "tol_cg_min": 1e-7, "verb": 0}
    )
    assert res_alpha.status == 1
    # H_alpha should never need dramatically more CG iterations than
    # unpreconditioned CG on a well-conditioned toy (sanity, not perf, bound)
    assert res_alpha.cg_iterations <= 3 * max(1, res_none.cg_iterations)


def test_erank_larger_than_block():
    # erank >= max block size - 1 triggers the auto-downgrade to the direct
    # solver (reference `src/Solvers.jl:427-433`)
    prob = _mixed_problem()
    with pytest.warns(UserWarning, match="direct solver"):
        res = lt.solve(prob, {"kit": 1, "erank": 20, "eDIMACS": 1e-7, "verb": 0})
    assert res.status == 1
    assert res.cg_iterations == 0  # solved on the direct path


def test_alpha_erank_2():
    # erank > 1 exercises the multi-column SMW path (the reference's k>1
    # "slow formula", src/Solvers.jl:752-767)
    from loraine_tpu.models import maxcut_problem

    W = np.zeros((10, 10))
    for i in range(5):
        for j in range(5, 10):
            W[i, j] = W[j, i] = 1.0 + 0.1 * ((i + j) % 3)
    prob = maxcut_problem(W)
    res1 = lt.solve(
        prob,
        {"kit": 1, "preconditioner": 1, "erank": 1, "eDIMACS": 1e-6,
         "tol_cg_min": 1e-7, "initpoint": 1, "verb": 0},
    )
    res2 = lt.solve(
        prob,
        {"kit": 1, "preconditioner": 1, "erank": 2, "eDIMACS": 1e-6,
         "tol_cg_min": 1e-7, "initpoint": 1, "verb": 0},
    )
    assert res1.status == 1 and res2.status == 1
    np.testing.assert_allclose(res2.objective, res1.objective, rtol=1e-5)
