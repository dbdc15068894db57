"""BASELINE config-5-class HEALTHY sharded row (VERDICT r3 item 5):
the hetero bundle-sharded driver at k=3 f64 limbs (~159 bits — the
precision Delsarte dim-8 2d=10 needs for the FULL reference contract,
BASELINE.md round-1) on an 8-device virtual CPU mesh, landing
gap < 1e-15 AND errors < 1e-30 SHARDED — replacing the round-2 config-5
row that ran k=2 "past its numeric range (ok=false expected)".

Usage: [XLA_FLAGS=--xla_force_host_platform_device_count=8]
       python scripts/run_delsarte10_hetero_k3.py [maxiter]
"""
import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8",
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import bench  # noqa: E402
import clrs_tpu.core.solver as S  # noqa: E402
from clrs_tpu.parallel.hetero import make_cluster_mesh, solve_hetero_sharded  # noqa: E402

maxiter = int(sys.argv[1]) if len(sys.argv) > 1 else 150

t0 = time.time()
problem, info = bench.build_problem(d=5, dtype=np.float64, k=3)
print(f"packed k=3 in {time.time()-t0:.0f}s; devices: {len(jax.devices())}")

cfg = S.SolverConfig(
    omega_p=100.0, omega_d=100.0, verbose=True,
    duality_gap_threshold=1e-15,
    primal_error_threshold=1e-30, dual_error_threshold=1e-30,
)
mesh = make_cluster_mesh(min(8, len(jax.devices())))
t0 = time.time()
out = solve_hetero_sharded(problem, mesh, maxiterations=maxiter, cfg=cfg)
row = out.history[-1] if out.history else {}
print(f"\nhetero-sharded k=3 (8 virtual devices): status={out.status} "
      f"gap={out.dual_gap:.3e} bound={1.0 - out.dual_objective:.15f} "
      f"iters={out.iterations} wall={time.time()-t0:.0f}s")
if row:
    print(f"final errors: P={row['P_err']:.2e} p={row['p_err']:.2e} "
          f"d={row['d_err']:.2e}")
