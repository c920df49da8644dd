"""Probe: theta1 dd2 floor with native dd NT scaling (nt_precision).

Run: JAX_PLATFORM_NAME=cpu python scripts/probe_ddnt.py [f64|dd]
Prints the per-iteration DIMACS breakdown so the floor and the breakdown
iteration are visible.
"""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import loraine_tpu as lt

ntp = sys.argv[1] if len(sys.argv) > 1 else "dd"
t0 = time.time()
r = lt.solve_sdpa(
    "tests/data/theta1.dat-s",
    {
        "kit": 0, "eDIMACS": 1e-19, "initpoint": 1, "verb": 0,
        "precision": "dd2", "nt_precision": ntp, "maxit": 40,
        "datasparsity": 0,
    },
)
print(f"nt_precision={ntp} status={r.status_name} wall={time.time()-t0:.1f}s")
print(f"objective={r.objective!r} dimacs={r.dimacs:.3e}")
best = min(h["dimacs"] for h in r.history)
print(f"best dimacs over history: {best:.3e}")
for i, h in enumerate(r.history):
    print(
        f"it={i+1:2d} mu={h['mu']:9.2e} dimacs={h['dimacs']:9.2e} "
        f"err1={h['err1']:9.2e} err2={h['err2']:9.2e} err3={h['err3']:9.2e} "
        f"err4={h['err4']:9.2e} err5={h['err5']:10.2e} err6={h['err6']:9.2e} "
        f"a={h['alpha_min']:6.3f} b={h['beta_min']:6.3f}"
    )
