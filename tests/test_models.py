"""Model-family regression tests with the reference's example anchors
(`examples/ex_maxcut.jl:46-47`, `examples/ex_corr.jl:30-31`,
`examples/ex_dist.jl:29,35-40`, `examples/k.jl:32-38`)."""
import numpy as np
import pytest

import loraine_tpu as lt
from loraine_tpu.models import (
    correlation_bounds,
    lovasz_theta_problem,
    lp_problem,
    maxcut_problem,
    minimum_distortion,
    solve_maxcut,
)


def test_maxcut_partition():
    W = np.array(
        [[0, 1, 5, 0], [1, 0, 0, 9], [5, 0, 0, 2], [0, 9, 2, 0]], dtype=float
    )
    S, T, val = solve_maxcut(W)
    # the graph is a 4-cycle with bipartition {0,3} / {1,2} and total edge
    # weight 17, so the relaxation is tight and rounding finds the exact cut
    assert sorted([tuple(sorted(S)), tuple(sorted(T))]) == [(0, 3), (1, 2)]
    np.testing.assert_allclose(val, 17.0, rtol=1e-5)


def test_maxcut_nonzero_diagonal():
    # Self-loops carry no cut weight: L = diag(W @ 1) - W subtracts W[i,i]
    # back out of the degree term, so adding a diagonal must not shift the
    # relaxation value (regression: the COO build once used 0.25*deg for the
    # F_0 diagonal, silently adding 0.25*trace(W)).
    W = np.array(
        [[0, 1, 5, 0], [1, 0, 0, 9], [5, 0, 0, 2], [0, 9, 2, 0]], dtype=float
    )
    Wd = W + np.diag([0.5, 0.25, 1.0, 0.75])
    _, _, val = solve_maxcut(W)
    _, _, val_d = solve_maxcut(Wd)
    np.testing.assert_allclose(val, 17.0, rtol=1e-5)
    np.testing.assert_allclose(val_d, val, rtol=1e-5)


def test_maxcut_rank1_path_matches():
    W = np.array(
        [[0, 1, 5, 0], [1, 0, 0, 9], [5, 0, 0, 2], [0, 9, 2, 0]], dtype=float
    )
    res0 = lt.solve(maxcut_problem(W, datarank=0), {"kit": 0, "eDIMACS": 1e-8, "verb": 0})
    res1 = lt.solve(maxcut_problem(W, datarank=-1), {"kit": 0, "eDIMACS": 1e-8, "verb": 0})
    assert res1.status == 1
    np.testing.assert_allclose(res0.objective, res1.objective, rtol=1e-7)


def test_correlation_bounds():
    lower, upper = correlation_bounds()
    np.testing.assert_allclose(lower, -0.9779977649, rtol=1e-6)
    np.testing.assert_allclose(upper, 0.8719210472, rtol=1e-6)


def test_minimum_distortion():
    c2, Q = minimum_distortion()
    np.testing.assert_allclose(c2, 4.0 / 3.0, atol=1e-4)
    Qref = (
        np.array(
            [[0, 0, 0, 0], [0, 4, -2, -2], [0, -2, 4, -2], [0, -2, -2, 4]],
            dtype=float,
        )
        / 3.0
    )
    np.testing.assert_allclose(Q, Qref, atol=1e-4)


def test_pure_lp():
    # max 2x s.t. x >= 1, x <= 2  ->  value 4 at x = 2, duals (0, 2)
    b = np.array([2.0])
    C_lin = np.array([[-1.0, 1.0]])
    d_lin = np.array([-1.0, 2.0])
    res = lt.solve(lp_problem(b, C_lin, d_lin), {"kit": 0, "eDIMACS": 1e-8, "verb": 0})
    assert res.status == 1
    np.testing.assert_allclose(-res.objective, 4.0, rtol=1e-6)  # b'y
    np.testing.assert_allclose(res.y, [2.0], rtol=1e-6)
    np.testing.assert_allclose(res.X_lin, [0.0, 2.0], atol=1e-6)


def test_lovasz_theta_small():
    # C5 (5-cycle): theta = sqrt(5)
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]
    prob = lovasz_theta_problem(5, edges)
    res = lt.solve(prob, {"kit": 0, "eDIMACS": 1e-8, "verb": 0, "initpoint": 1})
    assert res.status == 1
    # res.objective = <J, X*> = theta(C5) = sqrt(5)
    np.testing.assert_allclose(res.objective, np.sqrt(5.0), rtol=1e-6)
