"""Worker for the REAL multi-process multihost test (one OS process = one
"host" with 4 virtual CPU devices; the global mesh spans all processes).

Usage: python scripts/mp_hetero_worker.py <process_id> <num_processes> <port>
Prints one final line:  MPRESULT pid=<i> gap=<g> iters=<n> md5=<hash of y limbs>
"""
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import clrs_tpu  # noqa: F401  (appends CPU determinism XLA flags)
from clrs_tpu.parallel.multihost import init_multihost, solve_hetero_multihost

os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

import numpy as np

import bench
import clrs_tpu.core.solver as S

assert init_multihost() == pid
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, jax.devices()

problem, info = bench.build_problem(d=2, dtype=np.float64, k=2)
cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False)
maxiter = int(os.environ.get("CLRS_MP_ITERS", "25"))
res = solve_hetero_multihost(problem, maxiterations=maxiter, cfg=cfg)
(_bstates, y) = res.raw_state
y_np = np.asarray(jax.device_get(y.limbs))
md5 = hashlib.md5(y_np.tobytes()).hexdigest()
print(
    f"MPRESULT pid={pid} gap={res.dual_gap:.17e} iters={res.iterations} "
    f"md5={md5}",
    flush=True,
)
