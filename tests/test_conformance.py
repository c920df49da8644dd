"""Conformance harness: the framework's analog of the reference's
MOI.Test suite (`test/MOI_wrapper.jl:9-55`) — randomized well-posed SDPs
solved across the option matrix and verified against the KKT conditions:

  primal feasibility   sum_i <A_j, X_i> + (C_lin x_lin)_j = b_j
  dual feasibility     C_i - sum_j y_j A_j^{(i)} = S_i >= 0
  complementarity      <X_i, S_i> ~ 0,  x_lin . s_lin ~ 0
  duality gap          sum <C_i, X_i> + d'x_lin = b'y
"""
import numpy as np
import pytest

import loraine_tpu as lt


def _random_feasible_sdp(seed, nb=2, n=10, m=7, nlin=3):
    """Construct data with a known strictly feasible primal-dual pair so the
    problem is solvable and well-posed."""
    rng = np.random.default_rng(seed)
    As, Cs = [], []
    y0 = rng.standard_normal(n) * 0.1
    for _ in range(nb):
        A = rng.standard_normal((n, m, m))
        A = (A + A.transpose(0, 2, 1)) / 2
        As.append(A)
        S0 = rng.standard_normal((m, m))
        S0 = S0 @ S0.T + m * np.eye(m)  # strictly PD slack
        C = np.einsum("j,jpq->pq", y0, A) + S0
        Cs.append(C)
    C_lin = rng.standard_normal((n, nlin)) if nlin else None
    d_lin = (C_lin.T @ y0 + 1.0 + rng.random(nlin)) if nlin else None
    # b from a strictly positive primal point
    b = np.zeros(n)
    X0s = []
    for A in As:
        Z = rng.standard_normal((m, m))
        X0 = Z @ Z.T + m * np.eye(m)
        X0s.append(X0)
        b += np.einsum("jpq,pq->j", A, X0)
    if nlin:
        x0 = 1.0 + rng.random(nlin)
        b += C_lin @ x0
    return As, Cs, b, C_lin, d_lin


def _check_kkt(prob_data, res, tol):
    As, Cs, b, C_lin, d_lin = prob_data
    n = b.shape[0]
    # primal feasibility
    r = b.copy()
    for A, X in zip(As, res.X):
        r -= np.einsum("jpq,pq->j", A, X)
    if C_lin is not None:
        r -= C_lin @ res.X_lin
    assert np.linalg.norm(r) / (1 + np.linalg.norm(b)) < tol, "primal infeasible"
    # dual feasibility + complementarity
    gap_p = 0.0
    for A, C, X in zip(As, Cs, res.X):
        S = C - np.einsum("j,jpq->pq", res.y, A)
        assert np.linalg.eigvalsh((S + S.T) / 2).min() > -tol * 10, "dual slack not PSD"
        assert abs(np.sum(S * X)) < tol * 100 * (1 + abs(np.sum(C * X))), "complementarity"
        gap_p += np.sum(C * X)
    if C_lin is not None:
        s_lin = d_lin - C_lin.T @ res.y
        assert s_lin.min() > -tol * 10
        gap_p += float(d_lin @ res.X_lin)
    by = float(b @ res.y)
    assert abs(gap_p - by) / (1 + abs(by)) < tol * 100, "duality gap"


CONFIGS = [
    {"kit": 0, "initpoint": 0},
    {"kit": 0, "initpoint": 1},
    {"kit": 0, "initpoint": 1, "storage": "sparse"},
    {"kit": 1, "preconditioner": 1, "initpoint": 1},
    {"kit": 1, "preconditioner": 2, "initpoint": 0},
    {"kit": 1, "preconditioner": 0, "initpoint": 1},
    {"kit": 0, "initpoint": 1, "nt_method": "svd", "eigh_backend": "xla"},
    {"kit": 0, "initpoint": 1, "step_eig": "chol"},
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[str(i) for i in range(len(CONFIGS))])
@pytest.mark.parametrize("seed", [0, 1])
def test_kkt_conformance(cfg, seed):
    cfg = dict(cfg)
    storage = cfg.pop("storage", "auto")
    data = _random_feasible_sdp(seed)
    As, Cs, b, C_lin, d_lin = data
    prob = lt.problem_from_dense(As, Cs, b, C_lin=C_lin, d_lin=d_lin, storage=storage)
    eps = 1e-7 if cfg.get("kit", 0) == 0 else 1e-5
    res = lt.solve(prob, {**cfg, "eDIMACS": eps, "verb": 0})
    assert res.status == 1, f"status {res.status_name}"
    _check_kkt(data, res, max(eps * 10, 1e-6))


def test_no_lp_cone_conformance():
    data = _random_feasible_sdp(7, nlin=0)
    As, Cs, b, C_lin, d_lin = data
    prob = lt.problem_from_dense(As, Cs, b)
    res = lt.solve(prob, {"eDIMACS": 1e-7, "verb": 0, "initpoint": 1})
    assert res.status == 1
    _check_kkt(data, res, 1e-6)
