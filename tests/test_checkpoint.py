"""Checkpoint / resume and warm-start (greenfield capability; the reference
has none, SURVEY section 5)."""
import numpy as np

import loraine_tpu as lt


def test_checkpoint_resume(tmp_path, data_dir):
    opts = {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0}
    full = lt.solve_sdpa(str(data_dir / "theta1.dat-s"), dict(opts))

    prob = lt.problem_from_sdpa(str(data_dir / "theta1.dat-s"))
    part = lt.solve(prob, {**opts, "maxit": 4})
    assert part.status == 4
    path = str(tmp_path / "ckpt.npz")
    lt.save_state(path, part.final_state)

    state = lt.load_state(path)
    resumed = lt.Solver(prob, lt.Options.from_dict(opts), initial_state=state).solve()
    assert resumed.status == 1
    np.testing.assert_allclose(resumed.objective, full.objective, rtol=1e-6)
    # warm start must save work vs starting over
    assert part.iterations + resumed.iterations <= full.iterations + 3


def test_pre_dd2_checkpoint_tail_zero_fill(tmp_path, data_dir):
    """A pre-dd2 (plain f64) checkpoint resumed under precision='dd2' gets
    zero-filled tails instead of crashing in build_step (ADVICE r3)."""
    prob = lt.problem_from_sdpa(str(data_dir / "theta1.dat-s"))
    part = lt.solve(prob, {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1,
                           "verb": 0, "maxit": 3})
    path = str(tmp_path / "ckpt_f64.npz")
    lt.save_state(path, part.final_state)
    state = lt.load_state(path)
    assert state.X_lo is None

    s = lt.Solver(prob, {"kit": 0, "verb": 0, "precision": "dd2",
                         "datasparsity": 0}, initial_state=state)
    norm = s._normalize_tails(state)
    assert norm.X_lo is not None and norm.S_lo is not None
    assert all(float(abs(t).max()) == 0.0 for t in norm.X_lo)
    assert float(abs(norm.y_lo).max()) == 0.0
    # and the reverse: a dd2 state resumed at f64 drops its tails
    s64 = lt.Solver(prob, {"kit": 0, "verb": 0})
    assert s64._normalize_tails(norm).X_lo is None


def test_final_state_present(data_dir):
    res = lt.solve_sdpa(
        str(data_dir / "theta1.dat-s"),
        {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0},
    )
    assert res.final_state is not None
    assert len(res.final_state.X) == 1
