"""End-to-end regression anchors, mirroring the reference's examples-as-tests
strategy (`test/runtests.jl`, `examples/solve_sdpa.jl:61`, BASELINE.md)."""
import numpy as np
import pytest

import loraine_tpu as lt


def test_theta1_direct(data_dir):
    res = lt.solve_sdpa(
        str(data_dir / "theta1.dat-s"),
        {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0},
    )
    assert res.status == 1
    np.testing.assert_allclose(res.objective, 23.0, rtol=1e-6)
    assert res.dimacs < 1e-6


def test_theta1_iterative_alpha(data_dir):
    res = lt.solve_sdpa(
        str(data_dir / "theta1.dat-s"),
        {
            "kit": 1, "eDIMACS": 1e-6, "tol_cg_min": 1e-7,
            "initpoint": 1, "preconditioner": 1, "erank": 1, "verb": 0,
        },
    )
    assert res.status == 1
    np.testing.assert_allclose(res.objective, 23.0, rtol=1e-6)


def test_theta1_iterative_beta_none(data_dir):
    for prec in (2, 0):
        res = lt.solve_sdpa(
            str(data_dir / "theta1.dat-s"),
            {
                "kit": 1, "eDIMACS": 1e-6, "tol_cg_min": 1e-7,
                "initpoint": 1, "preconditioner": prec, "verb": 0,
            },
        )
        assert res.status == 1
        np.testing.assert_allclose(res.objective, 23.0, rtol=1e-6)


def test_control1_direct(data_dir):
    res = lt.solve_sdpa(
        str(data_dir / "control1.dat-s"),
        {"kit": 0, "eDIMACS": 1e-7, "initpoint": 1, "verb": 0},
    )
    assert res.status == 1
    # SDPLIB optimum
    np.testing.assert_allclose(res.objective, 17.78463, rtol=1e-5)


def test_tru3_direct(data_dir):
    res = lt.solve_sdpa(
        str(data_dir / "tru3.dat-s"),
        {"kit": 0, "eDIMACS": 1e-7, "initpoint": 1, "verb": 0},
    )
    assert res.status == 1
    assert res.dimacs < 1e-7


def test_vib3_direct(data_dir):
    # two PSD blocks of different sizes + LP cone
    res = lt.solve_sdpa(
        str(data_dir / "vib3.dat-s"),
        {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0},
    )
    assert res.status == 1
    np.testing.assert_allclose(res.objective, 0.1027087, rtol=1e-4)


def test_primal_dual_gap_small(data_dir):
    res = lt.solve_sdpa(
        str(data_dir / "theta1.dat-s"),
        {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0},
    )
    assert abs(res.objective - res.dual_objective) / (1 + abs(res.objective)) < 1e-5


def test_solution_extraction_shapes(data_dir):
    res = lt.solve_sdpa(
        str(data_dir / "theta1.dat-s"),
        {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0},
    )
    assert len(res.X) == 1 and res.X[0].shape == (50, 50)
    assert len(res.S) == 1 and res.S[0].shape == (50, 50)
    assert res.y.shape == (104,)
    # primal block PSD (allow small tolerance)
    w = np.linalg.eigvalsh(res.X[0])
    assert w.min() > -1e-8


def test_maxit_status(data_dir):
    res = lt.solve_sdpa(
        str(data_dir / "theta1.dat-s"),
        {"kit": 0, "eDIMACS": 1e-12, "maxit": 3, "initpoint": 1, "verb": 0},
    )
    assert res.status == 4
    assert res.iterations == 3
