#!/usr/bin/env python
"""Benchmark entry point.

Covers the five BASELINE.json configs on the attached device:

  theta1    — SDPA input, direct solver kit=0, single small block
  tru9      — multi-block + LP cone (truss topology), direct, sparse data
  control1  — control/arch class, iterative kit=1 + H_alpha preconditioner
  maxG11    — rank-one data compression (datarank=-1)
  thetaG11  — rank-one data compression, larger n
  (the 2-host sharded config is measured separately by benchmarks/scaling.py
   and the driver's dryrun_multichip — one physical chip here)

Each case solves to DIMACS 1e-5-or-better and reports steady-state IPM
iteration throughput (compile excluded by a warm-up solve).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "per_problem": {...}}

vs_baseline: the reference publishes no benchmark numbers (BASELINE.md:
"published": {}), so the baseline is a fixed per-problem anchor table
REF_ITERS_PER_SEC estimating Loraine.jl-CPU-class throughput for the same
instances; vs_baseline is the geometric mean of per-problem ratios. The
constants are kept fixed so round-over-round values are comparable.
"""
import argparse
import json
import math
import sys
import time

import loraine_tpu as lt

# Per-problem Loraine.jl-CPU-class anchors (iters/s). Basis, per problem
# (no published numbers exist; flop model = direct-path per-iteration cost,
# Schur assembly + n^3/3 Cholesky, at ~10 GFLOP/s effective LAPACK):
#   theta1   (n=104,  1x m=50):    ~0.5 s / 11 iters observed-class   -> 22
#   control1 (n=21,   m=10+5, CG): tiny; CG path overheads dominate   -> 60
#   tru9     (n=3240, 2x m=145 + 6480 LP, sparse data): n^3/3 chol
#            ~3.7 GFLOP + sparse assembly ~ 0.5-1 s/iter              -> 1.0
#   maxG11   (n=800,  m=800, rank-1): ~7 s / 15 iters                 -> 2.1
#   thetaG11 (n=2401, m=801, rank-1): rank-1 assembly O(n m^2 + n^2 m)
#            ~6 GFLOP + 4.6 GFLOP chol ~ 1.5-2.5 s/iter               -> 0.5
REF_ITERS_PER_SEC = {
    "theta1": 22.0,
    "control1-cg": 60.0,
    "tru9": 1.0,
    "maxG11": 2.1,
    "thetaG11": 0.5,
}

CASES = [
    ("theta1", "tests/data/theta1.dat-s",
     {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0}),
    ("control1-cg", "tests/data/control1.dat-s",
     {"kit": 1, "preconditioner": 1, "eDIMACS": 1e-5, "tol_cg_min": 1e-6,
      "initpoint": 1, "verb": 0}),
    ("tru9", "tests/data/tru9.dat-s",
     {"kit": 0, "eDIMACS": 1e-5, "initpoint": 1, "verb": 0}),
    ("maxG11", "tests/data/maxG11.dat-s",
     {"kit": 0, "eDIMACS": 1e-5, "initpoint": 1, "datarank": -1, "verb": 0}),
    ("thetaG11", "tests/data/thetaG11.dat-s",
     {"kit": 0, "eDIMACS": 1e-5, "initpoint": 1, "datarank": -1, "verb": 0}),
]

EXTRA_CASES = [
    ("control1", "tests/data/control1.dat-s",
     {"kit": 0, "eDIMACS": 1e-5, "initpoint": 1, "verb": 0}),
    ("theta1-cg", "tests/data/theta1.dat-s",
     {"kit": 1, "eDIMACS": 1e-5, "tol_cg_min": 1e-5, "preconditioner": 1,
      "initpoint": 1, "verb": 0}),
    ("vib9", "tests/data/vib9.dat-s",
     {"kit": 0, "eDIMACS": 1e-5, "initpoint": 1, "verb": 0}),
]


def bench_case(name, path, opts):
    # warm-up solve compiles the step for this problem shape; the second
    # solve reuses the in-process jit cache, so its iteration times are
    # steady-state device times.
    r1 = lt.solve_sdpa(path, dict(opts))
    if r1.status != 1:
        print(f"# {name}: warm-up status {r1.status_name}", file=sys.stderr)
    t0 = time.time()
    r2 = lt.solve_sdpa(path, dict(opts))
    wall = time.time() - t0
    # drop the first iteration (may still include some re-trace overhead)
    times = r2.iteration_times[1:] or r2.iteration_times
    per_iter = sum(times) / len(times)
    ips = 1.0 / per_iter
    print(
        f"# {name}: status={r2.status_name} iters={r2.iterations} "
        f"dimacs={r2.dimacs:.2e} obj={r2.objective:.6f} wall={wall:.2f}s "
        f"it/s={ips:.2f}",
        file=sys.stderr,
    )
    return ips, wall, r2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="run extra cases")
    ap.add_argument(
        "--budget", type=float, default=3600.0,
        help="wall-clock budget (s); remaining cases are skipped once "
        "exceeded (first-time XLA compiles through the TPU tunnel can cost "
        "tens of minutes before the persistent cache is populated)",
    )
    args = ap.parse_args()

    cases = CASES + (EXTRA_CASES if args.full else [])
    per_problem = {}
    ratios = []
    rates = []
    t_start = time.time()
    for name, path, opts in cases:
        if time.time() - t_start > args.budget:
            print(f"# budget exceeded, skipping {name}", file=sys.stderr)
            continue
        try:
            ips, wall, r = bench_case(name, path, opts)
        except Exception as e:  # keep the bench line intact on partial failure
            print(f"# {name} failed: {e}", file=sys.stderr)
            continue
        ref = REF_ITERS_PER_SEC.get(name)
        per_problem[name] = {
            "iters_per_sec": round(ips, 3),
            "wall_s": round(wall, 2),
            "iterations": r.iterations,
            "status": r.status_name,
            "dimacs": float(f"{r.dimacs:.3e}"),
            "ref_iters_per_sec": ref,
            "vs_ref": round(ips / ref, 3) if ref else None,
        }
        rates.append(ips)
        if ref:
            ratios.append(ips / ref)

    if not rates:
        print(json.dumps({"metric": "sdplib_ipm_iters_per_sec_geomean",
                          "value": 0.0, "unit": "iters/s", "vs_baseline": 0.0}))
        return
    geomean = math.exp(sum(math.log(r) for r in rates) / len(rates))
    vs = (
        math.exp(sum(math.log(r) for r in ratios) / len(ratios))
        if ratios else 0.0
    )
    print(
        json.dumps(
            {
                "metric": "sdplib_ipm_iters_per_sec_geomean",
                "value": round(geomean, 3),
                "unit": "iters/s",
                "vs_baseline": round(vs, 3),
                "per_problem": per_problem,
            }
        )
    )


if __name__ == "__main__":
    main()
