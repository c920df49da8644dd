#!/usr/bin/env python
"""SDPLIB-style benchmark harness (BASELINE.md north star: wall-clock to
DIMACS 1e-5 and IPM iterations/s).

    python benchmarks/run_sdplib.py                  # all bundled problems
    python benchmarks/run_sdplib.py theta1 maxG11    # subset
    python benchmarks/run_sdplib.py --eDIMACS 1e-6

Per problem prints one JSON line with objective, iterations, wall-clock of
the warm (second) solve, and steady-state iterations/s.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import loraine_tpu as lt

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "data")

# per-problem recommended options (reference README.md:70-75 regimes)
PROBLEMS = {
    "theta1": {"kit": 0},
    "control1": {"kit": 0},
    "tru3": {"kit": 0},
    "vib3": {"kit": 0},
    "tru9": {"kit": 0},
    "vib9": {"kit": 0},
    "maxG11": {"kit": 0, "datarank": -1},
    "thetaG11": {"kit": 0, "datarank": -1},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=[])
    ap.add_argument("--eDIMACS", type=float, default=1e-5)
    ap.add_argument("--kit", type=int, default=None)
    ap.add_argument("--cold", action="store_true", help="skip the warm-up solve")
    args = ap.parse_args()

    names = args.names or list(PROBLEMS)
    for name in names:
        opts = dict(PROBLEMS.get(name, {}))
        opts.update({"eDIMACS": args.eDIMACS, "initpoint": 1, "verb": 0})
        if args.kit is not None:
            opts["kit"] = args.kit
        path = os.path.join(DATA, f"{name}.dat-s")
        try:
            if not args.cold:
                lt.solve_sdpa(path, dict(opts))  # compile warm-up
            t0 = time.time()
            res = lt.solve_sdpa(path, dict(opts))
            wall = time.time() - t0
            times = res.iteration_times[1:] or res.iteration_times
            per_it = sum(times) / len(times)
            print(
                json.dumps(
                    {
                        "problem": name,
                        "status": res.status_name,
                        "objective": round(res.objective, 8),
                        "dimacs": res.dimacs,
                        "iterations": res.iterations,
                        "wall_s": round(wall, 3),
                        "iters_per_sec": round(1.0 / per_it, 3),
                    }
                ),
                flush=True,
            )
        except Exception as e:
            print(json.dumps({"problem": name, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
