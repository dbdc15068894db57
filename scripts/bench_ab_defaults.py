"""A/B the Pallas kernel defaults on a numerically healthy config
(VERDICT r3 item 3 / weak #1-#2).

Measures steady-state fused-scan it/s on Delsarte dim-8 (BASELINE
config-1 family) for each Pallas-kernel flag variant, on the current
backend, with a health check (ok flag + gap from the post-scan state).
The round-2 use_pallas_matmul default was justified on a numerically
diverging config-2 run; this is the healthy-run re-validation.

Variants (each one flag-delta from the default):
  default    use_pallas_matmul auto (on on TPU), steplength off, inverse off
  mm-off     use_pallas_matmul=False (pure XLA expansion path)
  +steplen   default + use_pallas_steplength=True
  +inverse   default + use_pallas_inverse=True
  all-on     matmul + steplength + inverse

Usage: python scripts/bench_ab_defaults.py [d] [k] [iters] [reps]
  d      Delsarte half-degree (default 5 -> 2d=10, config 1)
  k      limb count (default 2 = dd; 6 = the healthy high-k rung)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

d = int(sys.argv[1]) if len(sys.argv) > 1 else 5
k = int(sys.argv[2]) if len(sys.argv) > 2 else 2
iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 7

import jax
import jax.numpy as jnp
import numpy as np

import clrs_tpu  # noqa: F401
import bench
import clrs_tpu.core.solver as S

platform = jax.default_backend()
dtype = np.float32 if platform == "tpu" else np.float64
print(f"platform={platform} d={d} k={k} iters={iters} reps={reps}",
      flush=True)

problem, info = bench.build_problem(d, dtype, k=k)

VARIANTS = [
    ("default", {}),
    ("mm-off", {"use_pallas_matmul": False}),
    ("+steplen", {"use_pallas_steplength": True}),
    ("+inverse", {"use_pallas_inverse": True}),
    ("all-on", {"use_pallas_steplength": True, "use_pallas_inverse": True}),
]

use_lu = k >= 4  # high-k rungs run LU-from-start (config-2 finding)

for name, flags in VARIANTS:
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False,
                         use_lu_schur=use_lu, **flags)
    try:
        step = S.make_fused_step(problem, cfg)

        def scan_steps(problem, state):
            def body(s, _):
                s2, _diag = step(problem, s, jnp.bool_(False))
                return s2, None
            out, _ = jax.lax.scan(body, state, None, length=iters)
            return out

        scan_jit = jax.jit(scan_steps)
        t0 = time.perf_counter()
        out = jax.block_until_ready(scan_jit(problem,
                                             S.initial_state(problem, cfg)))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = scan_jit(problem, S.initial_state(problem, cfg))
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        _, diag = step(problem, out, jnp.bool_(False))
        gap = float(np.asarray(diag["gap_hi"]))
        ok = bool(np.asarray(diag["ok"]))
        print(f"{name:9s}  {iters/med:8.1f} it/s  med {med:.4f}s "
              f"IQR [{ts[len(ts)//4]:.4f}, {ts[3*len(ts)//4]:.4f}] "
              f"compile {compile_s:5.1f}s  ok={ok} gap={gap:.2e}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:9s}  FAILED: {type(e).__name__}: {e}", flush=True)
