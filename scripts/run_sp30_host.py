"""Sphere packing 2d=30 (BASELINE config 2, the large-Schur single main
cluster: dim_S=93, PSD blocks 32/30) through the host high-precision
path at the reference's 512-bit-equivalent (k=10 f64 limbs ~ 530 bits).

Round 1 could only measure this config's dd-f32 THROUGHPUT on TPU (the
numerics overflow dd within 20 iterations); this lands the reference's
FULL default contract (gap < 1e-15 AND P/p/d < 1e-30 simultaneously,
MPMP.jl:607-609) on the large config.

Usage: python scripts/run_sp30_host.py [k] [refine_steps] [maxiter]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
refine = int(sys.argv[2]) if len(sys.argv) > 2 else 1
maxiter = int(sys.argv[3]) if len(sys.argv) > 3 else 350

import mpmath

from clrs_tpu.apps.sphere_packing import nsphere_packing_2point

setup_prec = 53 * k + 150
mpmath.mp.prec = setup_prec
r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]
t0 = time.time()
bound, res = nsphere_packing_2point(
    3, 15, r, 2,
    prec=setup_prec,
    backend="host",
    precision_k=k,
    refine_steps=refine,
    maxiterations=maxiter,
    verbose=True,
    stall_patience=60,
    duality_gap_threshold=1e-15,
    primal_error_threshold=1e-30,
    dual_error_threshold=1e-30,
)
row = res.history[-1] if res.history else {}
print(f"\nk={k} refine={refine}: bound={bound} status={res.status} "
      f"gap={res.dual_gap:.3e} iters={res.iterations} "
      f"wall={time.time()-t0:.0f}s")
if row:
    print(f"final errors: P={row['P_err']:.2e} p={row['p_err']:.2e} "
          f"d={row['d_err']:.2e}")
