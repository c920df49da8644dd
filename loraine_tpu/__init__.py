"""loraine_tpu: a TPU-native low-rank interior-point SDP solver.

A from-scratch JAX/XLA framework with the capabilities of Loraine.jl
(primal-dual predictor-corrector interior point method for linear SDPs with
low-rank structure exploitation), re-designed TPU-first: batched block
groups, einsum Schur assembly, jit-compiled iterations, mesh sharding for
multi-chip scale-out.

Quick start::

    import loraine_tpu as lt
    res = lt.solve_sdpa("theta1.dat-s", {"eDIMACS": 1e-6})
    print(res.objective)

or from raw data::

    prob = lt.problem_from_dense(As, Cs, b)
    res = lt.solve(prob, {"kit": 0})
"""
import os as _os

import jax as _jax

# The IPM requires float64 for late iterations (the reference goes further
# with MultiFloats Float64xN); enable x64 before any arrays are created.
_jax.config.update("jax_enable_x64", True)

_persistent_cache_enabled = False


def _enable_persistent_cache() -> None:
    """Persistent compilation cache: TPU compiles of the fused IPM step run
    minutes through the tunnel; cache executables on disk across processes.
    TPU-only — the XLA:CPU AOT loader warns about feature mismatches when
    reloading CPU executables, and CPU compiles are cheap anyway. Called
    lazily (first Solver.solve) so backend selection has settled."""
    global _persistent_cache_enabled
    if _persistent_cache_enabled:
        return
    _persistent_cache_enabled = True
    try:
        if _jax.default_backend() == "cpu":
            return
        cache_dir = _os.environ.get(
            "LORAINE_TPU_CACHE",
            _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
        )
        _jax.config.update("jax_compilation_cache_dir", _os.path.abspath(cache_dir))
        # cache EVERYTHING: through the tunnel even trivial executables cost
        # seconds to compile, and backend-reported compile times understate it
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization; never fail over it
        pass

from . import modeling
from .config import Options, DEFAULT_OPTIONS
from .io.sdpa import SDPAData, read_sdpa, write_sdpa
from .io.poema import read_poema_json, write_poema_json, read_mat_dict
from .problem import (
    BlockGroup,
    SDPProblem,
    problem_from_dense,
    problem_from_dict,
    problem_from_sdpa,
)
from .ipm.admm import ADMMResult, solve_admm
from .ipm.solver import Result, Solver, load_problem, solve, solve_json, solve_sdpa
from .ipm.state import IPMState
from .utils.checkpoint import load_state, save_state

__version__ = "0.1.0"

__all__ = [
    "modeling",
    "Options",
    "DEFAULT_OPTIONS",
    "SDPAData",
    "read_sdpa",
    "write_sdpa",
    "BlockGroup",
    "SDPProblem",
    "problem_from_dense",
    "problem_from_dict",
    "problem_from_sdpa",
    "read_poema_json",
    "write_poema_json",
    "read_mat_dict",
    "Result",
    "Solver",
    "solve",
    "solve_sdpa",
    "load_problem",
    "solve_json",
    "solve_admm",
    "ADMMResult",
    "IPMState",
    "save_state",
    "load_state",
]
