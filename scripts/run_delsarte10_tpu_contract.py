"""Delsarte dim-8 2d=10 (BASELINE config 1) at the FULL reference
contract (duality gap < 1e-15 AND primal/dual errors < 1e-30,
/root/reference/MPMP.jl:607-609) TPU-RESIDENT, via scaled f32 limb
expansions.

The k=3 f64 CPU row (BASELINE round-1) lands this contract at ~159
bits; scaled f32 k=7 (S=24 -> 168 bits) is the equivalent on-chip rung
— f32 limbs are the TPU-native representation (TPU f64 is non-IEEE
emulation), and the scaled-expansion mode lifts the f32 exponent floor
that plain f32 expansions hit below ~2^-126.

Usage: python scripts/run_delsarte10_tpu_contract.py [k] [maxiter]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

k = int(sys.argv[1]) if len(sys.argv) > 1 else 7
maxiter = int(sys.argv[2]) if len(sys.argv) > 2 else 200

os.environ.setdefault("CLRS_XF_ELEMWISE_PALLAS_MIN_K", str(min(k, 10)))

import jax  # noqa: E402  (TPU default backend)
import numpy as np  # noqa: E402

print("devices:", jax.devices(), flush=True)

from bench import build_problem  # noqa: E402  (config-1 construction)
from clrs_tpu.core.problem import pack_constraints  # noqa: E402
from clrs_tpu.core.solver import solverank1sdp  # noqa: E402

t0 = time.time()
cons, b, info = build_problem(5, np.float32, k=k, return_cons=True)
problem = pack_constraints(
    cons, b, info=info, k=k, dtype=np.float32, scale_bits=24)
print(f"pack {time.time()-t0:.0f}s; k={k} f32 scaled (S=24, ~{24*k} bits)",
      flush=True)
t0 = time.time()
res = solverank1sdp(
    problem=problem,
    omega_p=100.0,
    omega_d=100.0,
    maxiterations=maxiter,
    scale_bits=24,
    verbose=True,
    stall_patience=60,
    duality_gap_threshold=1e-15,
    primal_error_threshold=1e-30,
    dual_error_threshold=1e-30,
)
bound = 1 - res.dual_objective
row = res.history[-1] if res.history else {}
print(f"\nTPU scaled-f32 k={k} ({24*k} bits): bound={bound} "
      f"status={res.status} gap={res.dual_gap:.3e} iters={res.iterations} "
      f"P={row.get('P_error', float('nan')):.2e} "
      f"p={row.get('p_error', float('nan')):.2e} "
      f"d={row.get('d_error', float('nan')):.2e} "
      f"wall={time.time()-t0:.0f}s", flush=True)
