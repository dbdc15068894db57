"""Delsarte dim-8 2d=10 (BASELINE.json config 1) to the full reference
contract (duality gap < 1e-15, MPMP.jl:607): TODO item "Delsarte 2d=10 at
k=3 to the full 1e-15 gap" — at dd (k=2) the run floors at a ~8e-10 gap
(bound 240.0000000008); k=3 (~159 bits) plus saddle-solve refinement
should reach the contract.

Usage: python scripts/run_delsarte10.py [k] [refine_steps] [maxiter]
For k >= 4 launch with XLA_FLAGS="--xla_backend_optimization_level=0
--xla_cpu_use_fusion_emitters=false" (see core/subproc.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
refine = int(sys.argv[2]) if len(sys.argv) > 2 else 1
maxiter = int(sys.argv[3]) if len(sys.argv) > 3 else 250

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import clrs_tpu  # noqa: F401
from clrs_tpu.apps.delsarte import delsarte_lp_bound

t0 = time.time()
bound, res = delsarte_lp_bound(
    8, 5,
    precision_k=k,
    refine_steps=refine,
    maxiterations=maxiter,
    verbose=True,
    stall_patience=60,
    duality_gap_threshold=1e-15,
    primal_error_threshold=1e-30,
    dual_error_threshold=1e-30,
)
print(f"\nk={k} refine={refine}: bound={bound!r} status={res.status} "
      f"gap={float(np.asarray(res.dual_gap)):.3e} "
      f"iters={res.iterations} wall={time.time()-t0:.0f}s")
print(f"|bound - 240| = {abs(bound - 240):.3e}")
