#!/usr/bin/env python
"""Pre-warm the TPU persistent compilation cache for the benchmark problems.

First-time XLA compiles through the remote TPU backend cost minutes to tens
of minutes per program; this script runs each bench case twice (compile +
steady state) so later solves — including the driver's bench.py — hit the
on-disk cache (.jax_cache/). Run with the TPU attached and nothing else
using it.
"""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import loraine_tpu as lt

CASES = [
    ('theta1', {'kit': 0, 'eDIMACS': 1e-6, 'initpoint': 1, 'verb': 0}),
    ('control1', {'kit': 1, 'preconditioner': 1, 'eDIMACS': 1e-5,
                  'tol_cg_min': 1e-6, 'initpoint': 1, 'verb': 0}),
    ('tru9', {'kit': 0, 'eDIMACS': 1e-5, 'initpoint': 1, 'verb': 0}),
    ('vib9', {'kit': 0, 'eDIMACS': 1e-5, 'initpoint': 1, 'verb': 0}),
    ('maxG11', {'kit': 0, 'eDIMACS': 1e-5, 'initpoint': 1, 'datarank': -1, 'verb': 0}),
    ('thetaG11', {'kit': 0, 'eDIMACS': 1e-5, 'initpoint': 1, 'datarank': -1, 'verb': 0}),
]

for name, opts in CASES:
    path = os.path.join(_ROOT, 'tests', 'data', f'{name}.dat-s')
    t0 = time.time()
    r = lt.solve_sdpa(path, dict(opts))
    print(name, 'solve1', round(time.time() - t0, 1), r.status_name,
          'obj', round(r.objective, 4), 'iters', r.iterations, flush=True)
    t0 = time.time()
    r = lt.solve_sdpa(path, dict(opts))
    periter = sum(r.iteration_times[1:]) / max(1, len(r.iteration_times) - 1)
    print(name, 'solve2', round(time.time() - t0, 2), 'periter',
          round(periter, 4), 'it/s', round(1 / periter, 2), flush=True)
