#!/usr/bin/env python
"""Solve an SDPA-format problem (the reference's `examples/solve_sdpa.jl`
flow). Run from the repo root:

    python examples/solve_sdpa.py [path/to/problem.dat-s]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import loraine_tpu as lt

path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "theta1.dat-s",
)

res = lt.solve_sdpa(
    path,
    {
        "kit": 0,            # direct solver; 1 for preconditioned CG
        "eDIMACS": 1e-6,
        "preconditioner": 1,
        "erank": 1,
        "verb": 1,
        "datarank": 0,       # -1 for rank-one data (maxG11/thetaG11)
        "initpoint": 1,
        "maxit": 100,
    },
)
print(f"status     : {res.status_name}")
print(f"objective  : {res.objective}")
print(f"iterations : {res.iterations}")
assert res.status == 1
