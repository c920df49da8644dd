"""Declarative modeling layer: reference example problems expressed the way
a JuMP user would write them (`examples/ex_maxcut.jl`, `ex_corr.jl`,
`ex_dist.jl`, `k.jl`), with the same numerical anchors."""
import numpy as np
import pytest

from loraine_tpu.modeling import Model, dot, trace


def test_maxcut_via_modeling():
    W = np.array([[0, 1, 5, 0], [1, 0, 0, 9], [5, 0, 0, 2], [0, 9, 2, 0]], dtype=float)
    N = 4
    L = np.diag(W @ np.ones(N)) - W
    m = Model()
    X = m.psd_var(N)
    for i in range(N):
        m.add_constraint(X[i, i] == 1)
    m.maximize(0.25 * dot(L, X))
    res = m.solve({"eDIMACS": 1e-7})
    assert res.status == 1
    np.testing.assert_allclose(res.objective, 17.0, rtol=1e-6)
    Xv = res.value(X)
    assert Xv.shape == (N, N)
    np.testing.assert_allclose(np.diag(Xv), 1.0, atol=1e-6)


def test_correlation_via_modeling():
    # reference anchors: ex_corr.jl:30-31
    vals = {}
    for sense in ("max", "min"):
        m = Model()
        X = m.psd_var(3)
        for i in range(3):
            m.add_constraint(X[i, i] == 1)
        m.add_constraint(X[0, 1] >= -0.2)
        m.add_constraint(X[0, 1] <= -0.1)
        m.add_constraint(X[1, 2] >= 0.4)
        m.add_constraint(X[1, 2] <= 0.5)
        if sense == "max":
            m.maximize(X[0, 2])
        else:
            m.minimize(X[0, 2])
        res = m.solve({"eDIMACS": 1e-8, "initpoint": 1})
        assert res.status == 1
        vals[sense] = res.objective
    np.testing.assert_allclose(vals["max"], 0.8719210472, rtol=1e-6)
    np.testing.assert_allclose(vals["min"], -0.9779977649, rtol=1e-6)


def test_distortion_via_modeling():
    # reference anchors: ex_dist.jl:29,35-40
    D = np.array(
        [[0.0, 1, 1, 1], [1, 0, 2, 2], [1, 2, 0, 2], [1, 2, 2, 0]]
    )
    m = Model()
    c2 = m.nonneg_var("c2")
    Q = m.psd_var(4)
    m.add_constraint(c2 >= 1)
    for i in range(4):
        for j in range(i + 1, 4):
            g = Q[i, i] + Q[j, j] - 2 * Q[i, j]
            m.add_constraint(g >= D[i, j] ** 2)
            m.add_constraint(g - D[i, j] ** 2 * c2 <= 0)
    m.add_constraint(Q[0, 0] == 0)
    m.minimize(c2)
    res = m.solve({"eDIMACS": 1e-8, "initpoint": 1})
    assert res.status == 1
    np.testing.assert_allclose(res.objective, 4.0 / 3.0, atol=1e-4)
    Qref = np.array(
        [[0, 0, 0, 0], [0, 4, -2, -2], [0, -2, 4, -2], [0, -2, -2, 4]], dtype=float
    ) / 3.0
    np.testing.assert_allclose(res.value(Q), Qref, atol=1e-4)


def test_lp_with_duals_via_modeling():
    # k.jl: max 2x, 1 <= x <= 2 -> obj 4, shadow prices 0 and 2
    m = Model()
    x = m.free_var("x")
    c1 = m.add_constraint(x >= 1)
    c2 = m.add_constraint(x <= 2)
    m.maximize(2 * x)
    res = m.solve({"eDIMACS": 1e-9})
    assert res.status == 1
    np.testing.assert_allclose(res.objective, 4.0, rtol=1e-6)
    np.testing.assert_allclose(res.value(x), 2.0, rtol=1e-6)
    # constraint multipliers (shadow prices up to sign convention)
    assert abs(res.dual(c1)) < 1e-6
    np.testing.assert_allclose(abs(res.dual(c2)), 2.0, rtol=1e-5)


def test_expression_algebra():
    m = Model()
    X = m.psd_var(2)
    e = 2 * X[0, 1] - X[0, 0] / 2 + 1 - X[1, 1]
    assert e.terms[("X", 0, 0, 1)] == 2.0
    assert e.terms[("X", 0, 0, 0)] == -0.5
    assert e.const == 1.0
    with pytest.raises(TypeError):
        _ = e * e  # nonlinear


def test_trace_helper():
    m = Model()
    X = m.psd_var(3)
    m.add_constraint(trace(X) == 1)
    m.maximize(dot(np.ones((3, 3)), X))
    res = m.solve({"eDIMACS": 1e-8})
    assert res.status == 1
    np.testing.assert_allclose(res.objective, 3.0, rtol=1e-6)  # theta of K3-bar
