#!/usr/bin/env python
"""Multi-device scaling measurement (BASELINE.md north star: iterations/s
at 1 chip / N devices, >= 70% scaling efficiency target).

Runs the jitted IPM step for a many-block SDP on meshes of increasing size
and reports steady-state step times + scaling efficiency. On this
environment only virtual CPU devices are available for multi-device runs
(one physical TPU chip), so the numbers validate the sharding mechanics and
collective overhead, not TPU ICI bandwidth; on a pod slice the same script
measures the real thing.

    JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import loraine_tpu as lt
    from loraine_tpu.ipm.initial import initial_point
    from loraine_tpu.ipm.step import build_step
    from loraine_tpu.parallel.mesh import make_mesh, shard_problem, shard_state

    rng = np.random.default_rng(0)
    nb, n, m = 16, 64, 32
    As, Cs = [], []
    for _ in range(nb):
        A = rng.standard_normal((n, m, m))
        As.append((A + A.transpose(0, 2, 1)) / 2)
        C = rng.standard_normal((m, m))
        Cs.append(C @ C.T + m * np.eye(m))
    b = rng.standard_normal(n)
    problem = lt.problem_from_dense(As, Cs, b)
    opts = lt.Options(verb=0).validated()
    state0 = initial_point(problem, opts)
    step = jax.jit(build_step(opts, -1))
    tol = jnp.asarray(1e-2, dtype=problem.b.dtype)

    ndev = len(jax.devices())
    results = []
    base = None
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= ndev]
    for nd in sizes:
        blocks_ax = min(nd, nb)
        mesh = make_mesh((blocks_ax, nd // blocks_ax), jax.devices()[:nd]) \
            if nd % blocks_ax == 0 else make_mesh((1, nd), jax.devices()[:nd])
        sp = shard_problem(problem, mesh)
        ss = shard_state(state0, problem, mesh)
        out = step(sp, ss, tol)
        jax.block_until_ready(out)  # compile
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(sp, ss, tol)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        if base is None:
            base = dt
        eff = base / (dt * nd)
        results.append({"devices": nd, "step_ms": round(dt * 1e3, 2),
                        "speedup": round(base / dt, 2), "efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    main()
