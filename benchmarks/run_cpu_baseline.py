#!/usr/bin/env python
"""Measure the own-CPU baseline for bench.py's cases — same commit, same
options, host CPU backend — into benchmarks/results_cpu_r2.jsonl.

This is the measured stand-in for "Loraine.jl CPU" (BASELINE.md north star:
faster per IPM iteration than the reference's CPU build; Julia is not
available in this environment, so the comparison baseline is THIS framework
on CPU — which round-over-round optimizations also speed up, hence the file
must be regenerated whenever the solver changes; see VERDICT r2 "Make the
baseline measured, not invented").

Run me with no other compute jobs on the host:
    JAX_PLATFORM_NAME=cpu python benchmarks/run_cpu_baseline.py
"""
import json
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

assert jax.default_backend() == "cpu", "the baseline must run on the host CPU"

import loraine_tpu as lt  # noqa: E402
from bench import CASES  # noqa: E402  (single source of truth for configs)

OUT = os.path.join(_ROOT, "benchmarks", "results_cpu_r2.jsonl")


def main():
    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=_ROOT,
        capture_output=True, text=True,
    ).stdout.strip()
    rows = []
    for name, path, opts in CASES:
        full = os.path.join(_ROOT, path)
        lt.solve_sdpa(full, dict(opts))  # compile warm-up
        t0 = time.time()
        r = lt.solve_sdpa(full, dict(opts))
        wall = time.time() - t0
        times = r.iteration_times[1:] or r.iteration_times
        per_it = sum(times) / len(times)
        row = {
            "problem": name,
            "status": r.status_name,
            "objective": round(r.objective, 8),
            "dimacs": r.dimacs,
            "iterations": r.iterations,
            "wall_s": round(wall, 3),
            "iters_per_sec": round(1.0 / per_it, 3),
            "commit": commit,
            "backend": "cpu",
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"# wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
