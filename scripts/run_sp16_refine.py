"""Sphere packing 2d=16 (known-answer config) at k limbs with saddle-solve
iterative refinement: TODO item "full contract (gap < 1e-15)" — the
remaining gap at k=4 was direction quality at cond(S)~1e58; refinement has
error (eps*cond)^q so extra rounds buy accuracy without more limbs.

Usage: python scripts/run_sp16_refine.py [k] [refine_steps] [maxiter]
Writes one log line per iteration; prints a summary at the end.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
refine = int(sys.argv[2]) if len(sys.argv) > 2 else 2
maxiter = int(sys.argv[3]) if len(sys.argv) > 3 else 300

import numpy as np
import mpmath
import jax

jax.config.update("jax_platforms", "cpu")

import clrs_tpu  # noqa: F401
from clrs_tpu.apps.sphere_packing import nsphere_packing_2point

mpmath.mp.prec = 512
r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]
t0 = time.time()
bound, res = nsphere_packing_2point(
    3, 8, r, 2,
    precision_k=k,
    refine_steps=refine,
    maxiterations=maxiter,
    verbose=True,
    stall_patience=60,
    duality_gap_threshold=1e-15 if k >= 4 else 1e-13,
    primal_error_threshold=1e-30,
    dual_error_threshold=1e-30,
)
print(f"\nk={k} refine={refine}: bound={bound} status={res.status} "
      f"gap={float(np.asarray(res.dual_gap)):.3e} "
      f"iters={res.iterations} wall={time.time()-t0:.0f}s")
