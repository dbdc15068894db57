"""Sphere packing 2d=16 (known-answer config) TPU-RESIDENT at the full
reference contract, via SCALED f32 limb expansions.

The reference runs this example at setprecision(512)
(examples/SpherePacking.jl:29-31); the host path lands the full contract
(gap < 1e-15 AND P/p/d < 1e-30, MPMP.jl:607-609) at k=6 f64 limbs
(~318 bits).  Plain f32 expansions cannot reach that regime at ANY k
(f32 exponent-floor, see ops/xfloat.py scaled-expansions note);
scaled-f32 k=14 = 336 bits can.  All hot ops run as Pallas custom calls
(matmul, Schur assembly, SPD inverses, step-length sandwich), which is
what keeps the high-k compile inside the relay helper's budget.

Usage: python scripts/run_sp16_tpu.py [k] [maxiter] [driver]
  k       f32 limb count (default 14 ~ 336 bits; 22 ~ 528 bits = the
          reference's own 512)
  driver  "phase" (default; per-phase jits, smaller compiles) or "scan"
          (device-resident lax.scan chunks)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

k = int(sys.argv[1]) if len(sys.argv) > 1 else 14
maxiter = int(sys.argv[2]) if len(sys.argv) > 2 else 200
driver = sys.argv[3] if len(sys.argv) > 3 else "phase"

import jax  # noqa: E402  (TPU default backend)
import mpmath  # noqa: E402
import numpy as np  # noqa: E402

from clrs_tpu.apps.sphere_packing import nsphere_packing_2point  # noqa: E402

print("devices:", jax.devices())
setup_prec = 24 * k + 200
mpmath.mp.prec = setup_prec
r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]

t0 = time.time()
cons, b, info = nsphere_packing_2point(
    3, 8, r, 2, prec=setup_prec, build_only=True
)
print(f"setup {time.time()-t0:.0f}s; packing at k={k} f32 scaled (S=24, "
      f"~{24*k} bits)")

from clrs_tpu.core.problem import pack_constraints  # noqa: E402
from clrs_tpu.core.solver import solverank1sdp  # noqa: E402

t0 = time.time()
problem = pack_constraints(
    cons, b, info=info, k=k, dtype=np.float32, scale_bits=24
)
print(f"pack {time.time()-t0:.0f}s")

t0 = time.time()
kwargs = dict(
    omega_p=100.0,
    omega_d=100.0,
    maxiterations=maxiter,
    scale_bits=24,
    use_pallas_inverse=True,
    use_pallas_steplength=True,
    verbose=True,
    stall_patience=60,
    duality_gap_threshold=1e-15,
    primal_error_threshold=1e-30,
    dual_error_threshold=1e-30,
)
if driver == "scan":
    from clrs_tpu.core.device_loop import solve_on_device

    res = solve_on_device(problem, **kwargs)
else:
    res = solverank1sdp(problem=problem, **kwargs)

row = res.history[-1] if res.history else {}
bound = -res.dual_objective
print(f"\nTPU scaled-f32 k={k} ({24*k} bits): bound={bound} "
      f"status={res.status} gap={res.dual_gap:.3e} iters={res.iterations} "
      f"wall={time.time()-t0:.0f}s")
if row:
    print(f"final errors: P={row['P_err']:.2e} p={row['p_err']:.2e} "
          f"d={row['d_err']:.2e}")
