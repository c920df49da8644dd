"""Host-side IPM driver: thin outer loop around the jitted step.

Mirrors the reference's `solve` loop (`src/Solvers.jl:304-361`): iteration
log, CG-tolerance schedule, hybrid-preconditioner switch, status handling.
The outer loop runs tens of iterations, so host round-trips per iteration
are negligible; every numeric kernel is inside the jitted step.

Status codes (reference `src/MOI_wrapper.jl:252-265`):
  0 = not solved, 1 = optimal, 2 = (probably) infeasible,
  3 = (probably) unbounded or infeasible, 4 = iteration/numerics limit.
"""
from __future__ import annotations

import dataclasses
import math
import time
import warnings
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Options
from ..problem import SDPProblem, problem_from_sdpa
from ..utils.timers import PhaseTimer
from .initial import initial_point
from .state import IPMState
from .step import jitted_step

__all__ = ["Result", "Solver", "solve", "solve_json", "solve_sdpa"]

STATUS_NAMES = {
    0: "NOT_SOLVED",
    1: "OPTIMAL",
    2: "INFEASIBLE",
    3: "INFEASIBLE_OR_UNBOUNDED",
    4: "ITERATION_LIMIT",
}


def _fetch(x) -> np.ndarray:
    """device->host fetch that also works for arrays sharded across
    processes (multi-host runs): such arrays are reassembled with a
    process allgather."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


@dataclasses.dataclass
class Result:
    """Solution container (reference result surface:
    `src/MOI_wrapper.jl:241-354`)."""

    status: int
    status_name: str
    objective: float  # -b^T y + b_const (SDPA-sense optimal value)
    dual_objective: float  # -sum <C_i, X_i> - d_lin^T x_lin
    y: np.ndarray
    X: List[np.ndarray]  # primal blocks, original order/sizes (unpadded)
    S: List[np.ndarray]  # dual slack blocks, original order/sizes
    X_lin: Optional[np.ndarray]
    iterations: int
    cg_iterations: int
    dimacs: float
    errs: Dict[str, float]
    solve_time: float
    iteration_times: List[float]
    timer: PhaseTimer
    final_state: Optional[IPMState] = None  # for warm-start / checkpointing
    history: Optional[List[Dict[str, float]]] = None  # per-iteration stats


class Solver:
    def __init__(
        self,
        problem: SDPProblem,
        options: Union[Options, Dict[str, Any], None] = None,
        initial_state: Optional[IPMState] = None,
    ):
        """``initial_state`` warm-starts the IPM from a saved iterate
        (see save_state/load_state); shapes must match the problem."""
        if isinstance(options, dict) or options is None:
            options = Options.from_dict(options)
        self.problem = problem
        self.opts = options.validated()
        self.timer = PhaseTimer()
        self.initial_state = initial_state
        self._apply_auto_downgrades()

    def _apply_auto_downgrades(self) -> None:
        """kit/datarank auto-downgrades (`src/Solvers.jl:421-444`)."""
        o = self.opts
        p = self.problem
        if o.kit == 1:
            if p.nlmi == 0:
                warnings.warn("Switching to a direct solver, no LMIs")
                o.kit = 0
            elif p.nlmi > 0 and o.erank >= max(g.m for g in p.groups) - 1:
                warnings.warn("Switching to a direct solver, erank bigger than matrix size")
                o.kit = 0

    # -- logging ----------------------------------------------------------
    def _header(self) -> None:
        o = self.opts
        p = self.problem
        if o.verb <= 0:
            return
        print(" *** loraine_tpu ***")
        print(f" Number of variables: {p.n:5d}")
        print(f" LMI constraints    : {p.nlmi:5d}")
        if p.nlmi > 0:
            sizes = []
            for g in p.groups:
                sizes += list(g.orig_sizes)
            print(" Matrix size(s)     :" + "".join(f"{s:6d}" for s in sizes))
        print(f" Linear constraints : {p.nlin:5d}")
        if o.kit > 0:
            print(f" Preconditioner     : {o.preconditioner:5d}")
        else:
            print(" Preconditioner     :  none, using direct solver")
        print(" *** IP STARTS")
        if o.verb < 2:
            if o.kit == 0:
                print(" it        obj         error     CPU/it")
            else:
                print(" it        obj         error     cg_iter   CPU/it")
        else:
            if o.kit == 0:
                print(" it        obj         error      err1      err2      err3      err4      err5      err6     CPU/it")
            else:
                print(" it        obj         error      err1      err2      err3      err4      err5      err6    cg_pre  cg_cor  CPU/it")

    def _log_iter(self, it: int, s: Dict[str, float], dt: float) -> None:
        o = self.opts
        if o.verb <= 0:
            return
        if o.verb > 1:
            if o.kit == 0:
                print(f"{it:3d} {s['obj']:16.8e} {s['dimacs']:9.2e} {s['err1']:9.2e} {s['err2']:9.2e} {s['err3']:9.2e} {s['err4']:9.2e} {s['err5']:9.2e} {s['err6']:9.2e} {dt:8.2f}")
            else:
                print(f"{it:3d} {s['obj']:16.8e} {s['dimacs']:9.2e} {s['err1']:9.2e} {s['err2']:9.2e} {s['err3']:9.2e} {s['err4']:9.2e} {s['err5']:9.2e} {s['err6']:9.2e} {int(s['cg_pre']):7d} {int(s['cg_cor']):7d} {dt:8.2f}")
        else:
            if o.kit == 0:
                print(f"{it:3d} {s['obj']:16.8e} {s['dimacs']:9.2e} {dt:8.2f}")
            else:
                print(f"{it:3d} {s['obj']:16.8e} {s['dimacs']:9.2e} {int(s['cg_pre'] + s['cg_cor']):9d} {dt:8.2f}")

    # -- main loop --------------------------------------------------------
    def solve(self) -> Result:
        from .. import _enable_persistent_cache

        _enable_persistent_cache()
        o = self.opts
        p = self.problem
        t_start = time.time()
        self._header()

        with self.timer.phase("initial point"):
            state = self.initial_state if self.initial_state is not None else initial_point(p, o)

        profiler_cm = None
        if o.profile_dir:
            profiler_cm = jax.profiler.trace(o.profile_dir)
            profiler_cm.__enter__()

        precond_kind = o.preconditioner if o.kit == 1 else -1
        with self.timer.phase("build/compile step"):
            step = jitted_step(o, precond_kind)

        tol_cg = o.tol_cg
        status = 0
        it = 0
        regcount = 0
        cg_tot = 0
        stats_h: Dict[str, float] = {}
        iteration_times: List[float] = []
        history: List[Dict[str, float]] = []
        dtype = p.b.dtype

        while status == 0:
            it += 1
            t2 = time.time()
            with self.timer.phase("ipm step"):
                state, stats = step(p, state, jnp.asarray(tol_cg, dtype=dtype))
                stats = jax.device_get(stats)
            dt = time.time() - t2
            iteration_times.append(dt)

            tol_cg = max(tol_cg * o.tol_cg_up, o.tol_cg_min)

            stats_h = {
                "obj": float(stats.obj), "mu": float(stats.mu),
                "err1": float(stats.err1), "err2": float(stats.err2),
                "err3": float(stats.err3), "err4": float(stats.err4),
                "err5": float(stats.err5), "err6": float(stats.err6),
                "dimacs": float(stats.dimacs),
                "cg_pre": int(stats.cg_iter_pre), "cg_cor": int(stats.cg_iter_cor),
            }
            cg_tot += stats_h["cg_pre"] + stats_h["cg_cor"]
            history.append(dict(stats_h))

            # numerical failure handling (reference regularization/give-up
            # semantics, src/predictor_corrector.jl:55-97, src/prepare_W.jl:5-26)
            if not bool(stats.h_ok):
                if o.verb > 0:
                    print("WARNING: H cannot be made positive definite, giving up")
                status = 3
                break
            if int(stats.h_shifts) > 0:
                regcount += 1
                if o.verb > 0:
                    print("Matrix H not positive definite, regularized")
                if regcount > 5:
                    if o.verb > 0:
                        print("WARNING: too many regularizations of H, giving up")
                    status = 3
                    break
            if not bool(stats.nt_ok):
                if o.verb > 0:
                    print("WARNING: X or S cannot be made positive definite, giving up")
                status = 4
                break
            if not math.isfinite(stats_h["dimacs"]):
                if o.verb > 0:
                    print("WARNING: numerical breakdown (non-finite error), giving up")
                status = 3
                break

            self._log_iter(it, stats_h, dt)

            if stats_h["dimacs"] < o.eDIMACS:
                status = 1
            elif stats_h["dimacs"] > 1e55:
                status = 2
                if o.verb > 0:
                    print("WARNING: Problem probably infeasible (stopping status = 2)")
            elif abs(stats_h["obj"]) > 1e55:
                status = 3
                if o.verb > 0:
                    print("WARNING: Problem probably unbounded or infeasible (stopping status = 3)")
            elif it >= o.maxit:
                status = 4
                if o.verb > 0:
                    print("WARNING: Stopped by iteration limit (stopping status = 4)")

            # hybrid preconditioner switch (src/Solvers.jl:339-347)
            if status == 0 and o.kit == 1 and precond_kind == 4:
                cg_cor = stats_h["cg_cor"]
                if (
                    cg_cor / 2 > o.erank * p.nlmi * math.sqrt(p.n) / 20
                    and it > math.sqrt(p.n) / 60
                ) or cg_cor > 100:
                    precond_kind = 1
                    o.aamat = 2
                    if o.verb > 0:
                        print("Switching to preconditioner 1")
                    with self.timer.phase("build/compile step"):
                        step = jitted_step(o, precond_kind)

        if profiler_cm is not None:
            jax.block_until_ready(state)
            profiler_cm.__exit__(None, None, None)

        solve_time = time.time() - t_start
        if o.verb > 0:
            if o.kit == 1:
                print(f" *** Total CG iterations: {cg_tot:8d}")
            if status == 1:
                print(f" *** Optimal solution found in {solve_time:8.2f} seconds")

        result = self._extract(state, stats_h, status, it, cg_tot, solve_time, iteration_times)
        result.history = history
        if o.verb > 0 and status == 1:
            print(f"Primal objective: {result.objective}")
            print(f"Dual objective:   {result.dual_objective}")
        if o.timing > 0 and o.verb > 0:
            print(self.timer.report())
        return result

    def _extract(self, state, stats_h, status, it, cg_tot, solve_time, iteration_times) -> Result:
        p = self.problem
        nblocks = p.nlmi
        Xb: List[Optional[np.ndarray]] = [None] * nblocks
        Sb: List[Optional[np.ndarray]] = [None] * nblocks
        for g, Xg, Sg in zip(p.groups, state.X, state.S):
            Xh = _fetch(Xg)
            Sh = _fetch(Sg)
            for bpos, (oidx, osize) in enumerate(zip(g.orig_indices, g.orig_sizes)):
                Xb[oidx] = Xh[bpos, :osize, :osize]
                Sb[oidx] = Sh[bpos, :osize, :osize]
        y = _fetch(state.y)
        X_lin = None if state.X_lin is None else _fetch(state.X_lin)

        # host-side arithmetic: avoids eager device programs (slow tunnel
        # compiles on TPU)
        trCX = 0.0
        for g, Xg, Sg in zip(p.groups, state.X, state.S):
            Ch = _fetch(g.C)
            Xh = _fetch(Xg)
            trCX += float(np.sum(Ch * Xh))
        dual_obj = -trCX
        if p.nlin > 0:
            dual_obj -= float(np.dot(_fetch(p.d_lin), X_lin))

        return Result(
            status=status,
            status_name=STATUS_NAMES.get(status, "UNKNOWN"),
            objective=float(-np.dot(np.asarray(jax.device_get(p.b)), y) + p.b_const),
            dual_objective=dual_obj,
            y=y,
            X=Xb,
            S=Sb,
            X_lin=X_lin,
            iterations=it,
            cg_iterations=cg_tot,
            dimacs=stats_h.get("dimacs", float("nan")),
            errs={k: stats_h.get(k, float("nan")) for k in ("err1", "err2", "err3", "err4", "err5", "err6")},
            solve_time=solve_time,
            iteration_times=iteration_times,
            timer=self.timer,
            final_state=state,
        )


def solve(problem: SDPProblem, options: Union[Options, Dict[str, Any], None] = None) -> Result:
    """Solve an SDPProblem. ``options`` may be an Options or a flat dict with
    the reference's option names."""
    return Solver(problem, options).solve()


def solve_json(path: str, options: Union[Options, Dict[str, Any], None] = None) -> Result:
    """Read a POEMA-JSON problem and solve it — the working replacement for
    the reference's `TBD/solve_json.jl` flow over the broken raw-dict entry
    (`src/Loraine.jl:30-93`)."""
    from ..io.poema import read_poema_json
    from ..problem import problem_from_dict

    if isinstance(options, dict) or options is None:
        options = Options.from_dict(options)
    options = options.validated()
    dtype = jnp.float64 if options.dtype == "float64" else jnp.float32
    d = read_poema_json(path)
    problem = problem_from_dict(
        d, datarank=options.datarank, pad_multiple=options.pad_multiple, dtype=dtype
    )
    return Solver(problem, options).solve()


def solve_sdpa(path: str, options: Union[Options, Dict[str, Any], None] = None) -> Result:
    """Read an SDPA .dat-s file and solve it (the `solve_sdpa` example flow,
    reference `examples/solve_sdpa.jl`)."""
    if isinstance(options, dict) or options is None:
        options = Options.from_dict(options)
    options = options.validated()
    dtype = jnp.float64 if options.dtype == "float64" else jnp.float32
    # datasparsity = 0 means "treat all data as dense" (reference
    # docs/src/Loraine_options.md:52-56); otherwise storage is auto-selected
    storage = "dense" if options.datasparsity == 0 else "auto"
    problem = problem_from_sdpa(
        path,
        datarank=options.datarank,
        pad_multiple=options.pad_multiple,
        dtype=dtype,
        storage=storage,
    )
    return Solver(problem, options).solve()
