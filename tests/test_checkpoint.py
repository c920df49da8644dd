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


def test_final_state_present(data_dir):
    res = lt.solve_sdpa(
        str(data_dir / "theta1.dat-s"),
        {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0},
    )
    assert res.final_state is not None
    assert len(res.final_state.X) == 1
