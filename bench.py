#!/usr/bin/env python
"""Benchmark entry point.

Solves SDPLIB anchor problems (theta1 direct; maxG11 with rank-one data
compression) to DIMACS 1e-5-or-better on the attached device and reports
steady-state IPM iteration throughput (compile excluded by warm-up).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: the reference publishes no benchmark numbers
(BASELINE.md: "published": {}), so the baseline is an in-repo anchor
constant REF_ITERS_PER_SEC recording Loraine.jl-CPU-class throughput for
the same instances (geometric mean), making the ratio stable across rounds.
"""
import argparse
import json
import math
import sys
import time

import loraine_tpu as lt

# Anchor: Loraine.jl on a modern CPU solves theta1 (n=104, m=50, 11 iters)
# in roughly 0.5 s and maxG11 (n=800, m=800, datarank=-1, ~15 iters) in
# roughly 7 s => per-problem iters/s ~ {22, 2.1}, geomean ~ 6.8. This is an
# estimate (no published numbers in the reference repo), kept fixed so
# round-over-round values are comparable.
REF_ITERS_PER_SEC_GEOMEAN = 6.8

CASES = [
    ("theta1", "tests/data/theta1.dat-s", {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0}),
    ("maxG11", "tests/data/maxG11.dat-s", {"kit": 0, "eDIMACS": 1e-5, "initpoint": 1, "datarank": -1, "verb": 0}),
]

EXTRA_CASES = [
    ("control1", "tests/data/control1.dat-s", {"kit": 0, "eDIMACS": 1e-5, "initpoint": 1, "verb": 0}),
    ("thetaG11", "tests/data/thetaG11.dat-s", {"kit": 0, "eDIMACS": 1e-5, "initpoint": 1, "datarank": -1, "verb": 0}),
    ("tru9", "tests/data/tru9.dat-s", {"kit": 0, "eDIMACS": 1e-6, "initpoint": 1, "verb": 0}),
    ("theta1-cg", "tests/data/theta1.dat-s", {"kit": 1, "eDIMACS": 1e-5, "tol_cg_min": 1e-5, "preconditioner": 1, "initpoint": 1, "verb": 0}),
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
    return ips, r2


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
    rates = []
    t_start = time.time()
    for name, path, opts in cases:
        if time.time() - t_start > args.budget:
            print(f"# budget exceeded, skipping {name}", file=sys.stderr)
            continue
        try:
            ips, _ = bench_case(name, path, opts)
            rates.append(ips)
        except Exception as e:  # keep the bench line intact on partial failure
            print(f"# {name} failed: {e}", file=sys.stderr)

    if not rates:
        print(json.dumps({"metric": "sdplib_ipm_iters_per_sec_geomean", "value": 0.0, "unit": "iters/s", "vs_baseline": 0.0}))
        return
    geomean = math.exp(sum(math.log(r) for r in rates) / len(rates))
    print(
        json.dumps(
            {
                "metric": "sdplib_ipm_iters_per_sec_geomean",
                "value": round(geomean, 3),
                "unit": "iters/s",
                "vs_baseline": round(geomean / REF_ITERS_PER_SEC_GEOMEAN, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
