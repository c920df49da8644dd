"""API-surface tests: raw-dict entry, CLI, options plumbing."""
import json
import subprocess
import sys

import numpy as np

import loraine_tpu as lt


def test_problem_from_dict_internal_convention():
    # same tiny SDP both ways: max b'y s.t. y*A <= C
    A = np.eye(2)[None]  # [n=1, 2, 2]
    C = np.diag([2.0, 3.0])
    b = np.array([1.0])
    p1 = lt.problem_from_dense([A], [C], b)
    from loraine_tpu.problem import problem_from_dict

    p2 = problem_from_dict({"nvar": 1, "As": [A], "Cs": [C], "b": b})
    r1 = lt.solve(p1, {"verb": 0, "eDIMACS": 1e-8})
    r2 = lt.solve(p2, {"verb": 0, "eDIMACS": 1e-8})
    assert r1.status == r2.status == 1
    np.testing.assert_allclose(r1.objective, r2.objective, rtol=1e-9)
    # optimum: y = 2 (binding at first diagonal entry)
    np.testing.assert_allclose(r1.y, [2.0], rtol=1e-6)


def test_problem_from_dict_reference_convention():
    from loraine_tpu.problem import problem_from_dict

    # reference-style dict stores the raw (negated) data: internal A = -A_raw
    A_raw = [-np.eye(2)[None]]
    C_raw = [-np.diag([2.0, 3.0])]
    p = problem_from_dict({"nvar": 1, "A": A_raw, "C": C_raw, "c": [-1.0]})
    r = lt.solve(p, {"verb": 0, "eDIMACS": 1e-8})
    assert r.status == 1
    np.testing.assert_allclose(r.y, [2.0], rtol=1e-6)


def test_cli_solve_json(data_dir):
    out = subprocess.run(
        [
            sys.executable, "-m", "loraine_tpu", "solve",
            str(data_dir / "theta1.dat-s"),
            "--kit", "0", "--eDIMACS", "1e-6", "--initpoint", "1",
            "--verb", "0", "--json",
        ],
        capture_output=True,
        text=True,
        env={"JAX_PLATFORM_NAME": "cpu", "PATH": "/usr/bin:/bin", "PYTHONPATH": str(data_dir.parent.parent)},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["status"] == "OPTIMAL"
    np.testing.assert_allclose(payload["objective"], 23.0, rtol=1e-6)


def test_timing2_prints_phase_breakdown(data_dir, capsys):
    """timing=2 surfaces the per-phase device-time attribution
    (utils/diagnostics.py; the reference's TimerOutputs tree,
    `src/Solvers.jl:467-476`)."""
    import loraine_tpu as lt

    r = lt.solve_sdpa(
        str(data_dir / "theta1.dat-s"),
        {"eDIMACS": 1e-4, "timing": 2, "verb": 1},
    )
    out = capsys.readouterr().out
    assert r.status == 1
    assert "per-phase device times" in out
    for phase in ("prepare_W", "Schur assembly", "H Cholesky",
                  "find_step spectral", "full fused step"):
        assert phase in out, f"missing phase row: {phase}"


def test_profile_phases_returns_named_sections():
    from loraine_tpu.utils.diagnostics import profile_phases, format_phases

    rng = np.random.default_rng(3)
    n, m = 8, 6
    A = rng.standard_normal((n, m, m))
    A = A + np.swapaxes(A, -1, -2)
    C = np.eye(m) * m
    import loraine_tpu as lt

    p = lt.problem_from_dense([A], [C], rng.standard_normal(n), pad_multiple=2)
    times = profile_phases(p, {"verb": 0}, repeats=2, iters=1)
    assert "full fused step" in times and times["full fused step"] > 0
    table = format_phases(times)
    assert "ground truth" in table
