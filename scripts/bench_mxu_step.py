"""Compare the fused IPM step with and without the integer-sliced MXU
matmul path (SolverConfig.use_mxu_matmul) on the current backend:
exactness of the iterates + per-iteration time over a scan stretch.

Usage: python scripts/bench_mxu_step.py [d] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

d = int(sys.argv[1]) if len(sys.argv) > 1 else 3
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

import jax
import jax.numpy as jnp
import numpy as np

import clrs_tpu  # noqa: F401
import bench
import clrs_tpu.core.solver as S

platform = jax.default_backend()
dtype = np.float32 if platform == "tpu" else np.float64
print(f"platform={platform} d={d} iters={iters}", flush=True)

problem, info = bench.build_problem(d, dtype)


def run(use_mxu):
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False,
                         use_mxu_matmul=use_mxu)
    step = S.make_fused_step(problem, cfg)

    def scan_steps(problem, state):
        def body(s, _):
            s2, _diag = step(problem, s, jnp.bool_(False))
            return s2, None
        out, _ = jax.lax.scan(body, state, None, length=iters)
        return out

    scan_jit = jax.jit(scan_steps)
    state0 = S.initial_state(problem, cfg)
    out = scan_jit(problem, state0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = scan_jit(problem, S.initial_state(problem, cfg))
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    _, diag = step(problem, out, jnp.bool_(False))
    return out, diag, dt


out0, diag0, dt0 = run(False)
print(f"vpu : {iters/dt0:8.1f} it/s  gap={float(np.asarray(diag0['gap_hi'])):.3e} "
      f"ok={bool(np.asarray(diag0['ok']))}", flush=True)
out1, diag1, dt1 = run(True)
print(f"mxu : {iters/dt1:8.1f} it/s  gap={float(np.asarray(diag1['gap_hi'])):.3e} "
      f"ok={bool(np.asarray(diag1['ok']))}", flush=True)

# exactness: compare y iterates limb-by-limb
y0 = np.asarray(out0[1].limbs, np.float64)
y1 = np.asarray(out1[1].limbs, np.float64)
scale = max(np.max(np.abs(y0)), 1e-300)
err = np.max(np.abs(y0 - y1)) / scale
print(f"y rel diff after {iters} iters: {err:.3e} "
      f"({'EXACT' if err == 0 else 'differs'})", flush=True)
