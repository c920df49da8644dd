"""Worker for the multi-process distributed test: each process initializes
jax.distributed, builds the same problem, shards it over the global mesh,
and solves; results must agree across processes. Launched by
test_distributed.py — not a test module itself."""
import os
import sys

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

from loraine_tpu.parallel import distributed

distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=rank)

import numpy as np

import loraine_tpu as lt
from loraine_tpu.parallel.mesh import make_mesh, shard_problem

rng = np.random.default_rng(0)  # same seed in every process: same problem
nb, n, m = 2, 12, 8
As, Cs = [], []
for _ in range(nb):
    A = rng.standard_normal((n, m, m))
    As.append((A + A.transpose(0, 2, 1)) / 2)
    C = rng.standard_normal((m, m))
    Cs.append(C @ C.T + m * np.eye(m))
b = rng.standard_normal(n)
problem = lt.problem_from_dense(As, Cs, b)

mesh = make_mesh((nproc, 1))  # blocks axis across processes
res = lt.solve(shard_problem(problem, mesh), {"kit": 0, "eDIMACS": 1e-7, "verb": 0})
print(f"RESULT rank={rank} status={res.status} objective={res.objective:.12f}", flush=True)
