"""Solver options.

Mirrors the reference option surface (Loraine.jl `src/Solvers.jl:169-302`,
`docs/src/Loraine_options.md`) with the same names, defaults, and
validation/auto-correction semantics (minus its known bugs: the reference reads
``datasparsity`` from the ``"maxit"`` key at `src/Solvers.jl:203`; we read it
from ``datasparsity``), plus TPU-specific knobs (``dtype``, ``pad_multiple``).
"""
from __future__ import annotations

import dataclasses
import warnings
from typing import Any, Dict, Optional


@dataclasses.dataclass
class Options:
    """Options for the interior-point solver.

    Reference semantics: Loraine.jl `docs/src/Loraine_options.md:4-56`.

    Attributes:
      kit: 0 = direct (Cholesky) linear solver, 1 = preconditioned CG.
      tol_cg: initial CG tolerance (relative residual).
      tol_cg_up: per-IPM-iteration multiplicative CG tolerance update.
      tol_cg_min: CG tolerance floor.
      eDIMACS: stopping tolerance on the sum of DIMACS errors.
      preconditioner: 0 none / 1 H_alpha / 2 H_beta / 4 hybrid (beta -> alpha).
      erank: estimated rank of the primal solution (H_alpha subspace size).
      aamat: ttau formula selector: 0 -> min(lambda_tail); otherwise
        (min+mean)/2 of the tail spectrum.
      fig_ev: unused diagnostic flag (kept for option-surface parity).
      verb: 0 silent, 1 short iteration log, 2 full DIMACS breakdown.
      datarank: 0 full-rank data; -1 factorize each A_i as +/- b_i b_i^T
        (falls back to 0 when factorization error > 5e-6, reference
        `src/model.jl:189-191`).
      initpoint: 0 = simple identity start, 1 = SDPT3-like scaled start.
      timing: print per-phase timing tree at the end of the solve.
      maxit: IPM iteration limit.
      datasparsity: dense/sparse data-kernel split control (reference
        `src/model.jl:153-174`). None (default) = Kojima-style modeled-cost
        auto-selection (problem.py pick_storage; the reference carries the
        original Kojima cost model commented out, `src/model.jl:234-287`);
        0 = force dense; k > 0 = explicit nnz threshold (the reference's
        shipped rule, default 8 there): matrices with at most k nonzeros go
        to the sparse gather path, at any n.
      dtype: 'float64' (default; IPM needs f64 late iterations) or 'float32'.
      pad_multiple: pad LMI block sizes up to a multiple of this (TPU tiling).
      step_eig: 'exact' batched eigh for steplengths, reserved for cheaper
        bound-based variants.
    """

    kit: int = 0
    tol_cg: float = 1.0e-2
    tol_cg_up: float = 0.5
    tol_cg_min: float = 1.0e-7
    eDIMACS: float = 1.0e-7
    preconditioner: int = 1
    erank: int = 1
    aamat: int = 1
    fig_ev: int = 0
    verb: int = 1
    datarank: int = 0
    initpoint: int = 0
    timing: int = 1
    maxit: int = 100
    datasparsity: Optional[int] = None
    # TPU-specific
    dtype: str = "float64"
    pad_multiple: int = 8
    # steplength lambda_min method:
    # 'auto' (default): on TPU the 'pallas' bound, on CPU 'exact';
    # 'pallas': single-kernel Jacobi + Gershgorin spectral bounds — a true
    #   lower bound up to an f32 backward-error margin, valid for any sweep
    #   count (ops/jacobi_pallas.py);
    # 'exact': the eigh_backend eigensolver (full eigenvalues);
    # 'lanczos': Ritz-residual lower bound, ~50 matvecs per phase. CAUTION:
    #   with a fixed iteration cap and deterministic start an unconverged
    #   Krylov space can return a value ABOVE the true lambda_min (no
    #   completeness guarantee) — kept as an opt-in, not a default;
    # 'chol': Cholesky-bisection lower bound (safe, compile-light, but the
    #   sequential small-Cholesky latency on TPU makes it slower at runtime)
    step_eig: str = "auto"
    cg_maxiter: int = 10000
    # kit=1 operator application: 'auto' materializes the Schur operator H
    # and the H_alpha matrix densely when n <= 512 (each CG iteration = 3
    # GEMVs instead of the ~20-kernel implicit per-block pipeline — a pure
    # win on latency-bound small problems); 'never' keeps the matrix-free
    # operator everywhere (the reference's regime, required at large n);
    # 'always' forces materialization (testing/benchmarking).
    cg_materialize: str = "auto"
    # CG loop implementation for the materialized small-n path:
    # 'auto' = 'ff' on TPU, 'xla' elsewhere.
    # 'xla': f64 device-loop CG (ops/cg.py; the materialized path runs it
    #   split-preconditioned at 6 ops per CG iteration).
    # 'ff': single-kernel in-VMEM float-float (2xf32, ~2^-47) CG + f64
    #   refinement (ops/pcg_pallas.py) — one Pallas kernel per solve instead
    #   of ~6 XLA ops per CG iteration; precise enough for the measured
    #   late-IPM conditioning (kappa ~ 1e10). TPU-only: Mosaic preserves the
    #   error-free transforms, XLA:CPU does not.
    # 'pallas': the plain-f32 kernel — OPT-IN and only sound at loose
    #   tolerances: its floor is ~u32 * kappa and it stalls near convergence
    #   (docs/tpu_notes.md "Fused f32 PCG: measured limits").
    cg_kernel: str = "auto"
    profile_dir: str = ""  # capture a jax.profiler trace of the solve
    nt_method: str = "eigh"  # 'eigh' (no SVD codepath) or 'svd' (reference)
    # 'pallas': single-kernel Pallas Jacobi f32 seed + f64 GEMM-only
    # refinement (compiles in seconds at any size; the TPU default);
    # 'jacobi': XLA-level parallel-Jacobi eigensolver (compiles in seconds,
    # per-round dispatch overhead grows with m); 'mixed': f32 QDWH seed +
    # f64 GEMM refinement (fast at large m, but the QDWH seed compiles for
    # MINUTES per shape through the remote TPU tunnel);
    # 'xla': pure-f64 QDWH (~10 s/call at m~800 on TPU);
    # 'auto': 'pallas' on TPU; on CPU jacobi below m=192, mixed above
    eigh_backend: str = "auto"
    # Large-GEMM backend for the rank-1 Schur assembly: 'f64' (default)
    # XLA's emulated-f64 GEMMs; 'int8' the exact integer Ozaki scheme on the
    # int8 MXU (ops/int8gemm.py) — f64-equivalent accuracy, oracle-tested in
    # tests/test_int8gemm.py. Opt-in pending a measured TPU win (the rank-1
    # per-iteration profile is Cholesky-dominated; see docs/tpu_notes.md).
    gemm_backend: str = "f64"
    # Cholesky backend for the large factorizations (Schur matrix H, NT
    # scaling's chol(X)): 'f64' the blocked f64 factorization; 'mixed' f32
    # MXU panels + f64 Newton refinement with per-panel f64 fallback
    # (ops/mixed_chol.py — measured ~75x panel speedup on v5e, identical
    # NaN/shift semantics); 'auto' = mixed on TPU for blocks >= 192, f64
    # otherwise (CPU always f64).
    chol_backend: str = "auto"
    # High-precision mode (the reference's MultiFloats Float64xN equivalent,
    # `README.md:37-54`): 'f64' plain float64; 'dd' double-double — Schur
    # assembly, RHS/residual contractions, and Schur-solve iterative
    # refinement run in ~2x working precision via error-free transforms and
    # Ozaki-scheme sliced GEMMs (ops/dd.py, ops/ozaki.py). Works on BOTH
    # linear-system paths (kit=0 direct, and kit=1 where PCG is wrapped in
    # dd iterative refinement, matching the reference's Float64xN-typed CG,
    # `src/predictor_corrector.jl:131-134`); pushes the attainable DIMACS
    # floor ~3 digits below plain f64 (theta1: 9.3e-14 vs 9.7e-10) at a
    # constant-factor FLOP cost (all GEMM-shaped).
    # 'dd2' additionally STORES the iterates (X, S, y, LP variables) as
    # double-double pairs and runs every residual/update on the pairs —
    # the x4-class tier: the DIMACS floor is no longer pinned by f64
    # iterate storage (direct path only; see docs/precision.md).
    precision: str = "f64"
    # Schur-assembly precision schedule. 'f64' (DEFAULT, round 5): always
    # exact. 'auto': on TPU, for flop-heavy problems (n >= 512), assemble
    # H with f32 MXU GEMMs (ops/schur.py schur_group_mixed) while total
    # DIMACS > 1e-3, then rebuild with the exact f64 assembly for the
    # endgame; residuals/NT/DIMACS stay f64 throughout. 'f32': force the
    # mixed assembly for the whole solve (testing / loose-tolerance runs).
    # WHY f64 IS THE DEFAULT: on the attached axon/v5e runtime the mixed
    # chunk is implicated in value-triggered TPU-worker deaths that the
    # round-5 bisection could narrow but not fix (ops/schur.py
    # schur_group_mixed, ROADMAP #1): both f32 sparse formulations fault
    # mid-solve, and even the LP-mixed-only solve died after its handover
    # rebuild, while the pure-f64 path solves every bench case clean at
    # the same steady-state speed class (the measured mixed win on tru9
    # was only ~8%/iter). 'auto'/'f32' remain available for runtimes
    # without the fault and are exercised on CPU by the multichip gate.
    # Reference cost profile: `src/makeBBBB.jl:24-36`; the switch mirrors
    # the reference's hybrid-preconditioner rebuild mechanics
    # (`src/Solvers.jl:339-347`).
    assembly_precision: str = "f64"
    # NT-scaling arithmetic for the dd2 tier. The measured dd2 wall
    # (docs/precision.md "the f64 NT wall") is the f64 NT stack: past
    # mu ~ 1e-14 the congruent spectrum eig(L_x' S L_x) sinks below the
    # f64 formation noise and the scaling basis is noise. 'dd' runs the
    # NT factorizations natively in double-double (ops/dd_linalg.py:
    # dd Cholesky + GEMM-anchored dd Jacobi warm-started from the f64
    # eigenbasis) — the TPU-native equivalent of the reference's
    # type-generic `prepare_W` at Float64x4 (`src/prepare_W.jl:41-45`,
    # `src/Solvers.jl:18`). 'auto' = 'dd' when precision='dd2', else
    # 'f64'. 'f64' keeps the plain NT stack (the dd2-without-dd-NT
    # configuration whose floor the table in docs/precision.md records).
    nt_precision: str = "auto"

    def validated(self) -> "Options":
        """Range-check options, auto-correcting out-of-range values with a
        warning (reference `src/Solvers.jl:263-291`)."""
        o = dataclasses.replace(self)
        if o.kit < 0 or o.kit > 1:
            o.kit = 0
            _warn(f"Parameter kit out of range, setting kit = {o.kit}")
        if o.tol_cg < o.tol_cg_min and o.kit == 1:
            o.tol_cg = o.tol_cg_min
            _warn(f"Parameter tol_cg smaller than tol_cg_min, setting tol_cg = {o.tol_cg:.1e}")
        if o.tol_cg_min > o.eDIMACS and o.kit == 1:
            o.tol_cg_min = o.eDIMACS
            _warn(f"Parameter tol_cg_min switched to eDIMACS = {o.eDIMACS:.1e}")
        if o.kit == 1 and (o.preconditioner < 0 or o.preconditioner > 4):
            o.preconditioner = 1
            _warn(f"Parameter preconditioner out of range, setting preconditioner = {o.preconditioner}")
        if o.erank < 0:
            o.erank = 1
            _warn(f"Parameter erank negative, setting erank = {o.erank}")
        if o.datarank < -1:
            o.datarank = 0
            _warn(f"Parameter datarank out of range, setting datarank = {o.datarank}")
        if o.datasparsity is not None and o.datasparsity < 0:
            o.datasparsity = None
            _warn("Parameter datasparsity negative, using automatic selection")
        if o.initpoint < 0 or o.initpoint > 1:
            o.initpoint = 1
            _warn(f"Parameter initpoint out of range, setting initpoint = {o.initpoint}")
        if o.dtype not in ("float32", "float64"):
            raise ValueError(f"dtype must be 'float32' or 'float64', got {o.dtype!r}")
        if o.nt_method not in ("eigh", "svd"):
            raise ValueError(f"nt_method must be 'eigh' or 'svd', got {o.nt_method!r}")
        if o.step_eig not in ("auto", "exact", "chol", "lanczos", "pallas"):
            raise ValueError(
                "step_eig must be 'auto', 'exact', 'chol', 'lanczos', or "
                f"'pallas', got {o.step_eig!r}"
            )
        if o.eigh_backend not in ("jacobi", "mixed", "xla", "auto", "pallas"):
            raise ValueError(
                "eigh_backend must be 'jacobi', 'mixed', 'xla', 'pallas', or "
                f"'auto', got {o.eigh_backend!r}"
            )
        if o.gemm_backend not in ("f64", "int8"):
            raise ValueError(
                f"gemm_backend must be 'f64' or 'int8', got {o.gemm_backend!r}"
            )
        if o.chol_backend not in ("auto", "f64", "mixed"):
            raise ValueError(
                f"chol_backend must be 'auto', 'f64', or 'mixed', got "
                f"{o.chol_backend!r}"
            )
        if o.cg_kernel not in ("auto", "xla", "ff", "pallas"):
            raise ValueError(
                f"cg_kernel must be 'auto', 'xla', 'ff', or 'pallas', got "
                f"{o.cg_kernel!r}"
            )
        if o.cg_materialize not in ("auto", "never", "always"):
            raise ValueError(
                "cg_materialize must be 'auto', 'never', or 'always', got "
                f"{o.cg_materialize!r}"
            )
        if o.precision not in ("f64", "dd", "dd2"):
            raise ValueError(
                f"precision must be 'f64', 'dd', or 'dd2', got {o.precision!r}"
            )
        if o.assembly_precision not in ("auto", "f64", "f32"):
            raise ValueError(
                f"assembly_precision must be 'auto', 'f64', or 'f32', got "
                f"{o.assembly_precision!r}"
            )
        if o.assembly_precision == "f32" and o.precision != "f64":
            raise ValueError(
                "assembly_precision='f32' conflicts with high-precision "
                "modes (precision='dd'/'dd2')"
            )
        if o.nt_precision not in ("auto", "f64", "dd"):
            raise ValueError(
                f"nt_precision must be 'auto', 'f64', or 'dd', got "
                f"{o.nt_precision!r}"
            )
        if o.nt_precision == "dd" and o.precision != "dd2":
            raise ValueError(
                "nt_precision='dd' (native dd NT scaling) requires "
                "precision='dd2' (dd-stored iterates feed the dd "
                "factorizations)"
            )
        if o.precision in ("dd", "dd2") and o.dtype != "float64":
            raise ValueError(f"precision={o.precision!r} requires dtype='float64'")
        if o.pad_multiple < 1:
            o.pad_multiple = 1
        return o

    @classmethod
    def from_dict(cls, options: Optional[Dict[str, Any]] = None) -> "Options":
        """Build from a flat string-keyed dict (reference `load`); unknown
        keys raise, matching the MOI adapter's attribute validation."""
        options = dict(options or {})
        fields = {f.name for f in dataclasses.fields(cls)}
        unknown = set(options) - fields
        if unknown:
            raise ValueError(f"Unknown option(s): {sorted(unknown)}; known: {sorted(fields)}")
        return cls(**options)


def _warn(msg: str) -> None:
    warnings.warn(msg, stacklevel=3)


DEFAULT_OPTIONS = Options()
