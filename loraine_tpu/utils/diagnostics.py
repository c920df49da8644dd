"""Per-phase timing diagnostics.

The production step is one fused jitted program (by design — fusion is the
TPU win), so phase times are measured here by running each phase as its own
jitted piece on a representative iterate. Phase names mirror the
reference's TimerOutputs sections (`prepare W`, `BBBB`/Schur, `backslash`,
`find_step`, SURVEY section 5).

    from loraine_tpu.utils.diagnostics import profile_phases
    times = profile_phases(problem, options)   # dict of seconds
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import Options
from ..ipm.initial import initial_point
from ..ops.linalg import chol_reg, cho_solve, sym
from ..ops.nt_scaling import nt_scale
from ..ops.schur import Aadj, Aop, lp_weight, schur_group, schur_lp

__all__ = ["profile_phases"]


def _timed(fn, *args, repeats: int = 3) -> float:
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn_j(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats


def profile_phases(problem, options: Optional[dict] = None, repeats: int = 3) -> Dict[str, float]:
    opts = Options.from_dict(options) if not isinstance(options, Options) else options
    opts = opts.validated()
    st = initial_point(problem, opts)
    out: Dict[str, float] = {}

    def all_nt(X, S):
        return tuple(
            nt_scale(x, s, method=opts.nt_method, eigh_backend=opts.eigh_backend)
            for x, s in zip(X, S)
        )

    out["prepare W (NT scaling)"] = _timed(all_nt, st.X, st.S, repeats=repeats)
    nts = jax.jit(all_nt)(st.X, st.S)

    def schur(nts):
        H = jnp.zeros((problem.n, problem.n), dtype=problem.b.dtype)
        for g, nt in zip(problem.groups, nts):
            H = H + schur_group(g, nt.W, nt.G)
        if problem.nlin:
            H = H + schur_lp(problem.C_lin, lp_weight(st.X_lin, 1.0 / st.S_lin))
        return sym(H)

    out["Schur assembly (BBBB)"] = _timed(schur, nts, repeats=repeats)
    H = jax.jit(schur)(nts)

    def hchol(H):
        hc = chol_reg(H, 1e-4, 1000)
        return cho_solve(hc.L, problem.b)

    out["H Cholesky + solve"] = _timed(hchol, H, repeats=repeats)

    def resid(X, y):
        Rp = problem.b
        for g, Xg in zip(problem.groups, X):
            Rp = Rp - Aop(g, Xg)
        Rds = tuple(sym(g.C - S - Aadj(g, y)) for g, S in zip(problem.groups, st.S))
        return Rp, Rds

    out["residuals"] = _timed(resid, st.X, st.y, repeats=repeats)

    from ..ipm.step import build_step

    step = jax.jit(build_step(opts, opts.preconditioner if opts.kit else -1))
    tol = jnp.asarray(opts.tol_cg, dtype=problem.b.dtype)
    jax.block_until_ready(step(problem, st, tol))
    t0 = time.perf_counter()
    for _ in range(repeats):
        res = step(problem, st, tol)
    jax.block_until_ready(res)
    out["full fused step"] = (time.perf_counter() - t0) / repeats
    return out
