"""Microbenchmark: batched dd SPD-inverse paths on the current backend.

Compares, over representative (B, n) block-batch shapes:
  - xla:    vmapped ops.linalg.xf_spd_inverse (fori-per-column XLA loop)
  - pallas: per-block-grid kernel (ops/pallas_dd.dd_spd_inverse_pallas)
  - wide:   batch-on-lanes kernel (dd_spd_inverse_pallas_wide)

Decides SolverConfig.use_pallas_inverse wiring (TODO.md perf item).
Usage: python scripts/bench_pallas_inverse.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50

import jax
import jax.numpy as jnp
import numpy as np

import clrs_tpu  # noqa: F401
from clrs_tpu.ops.linalg import xf_spd_inverse
from clrs_tpu.ops.pallas_dd import (
    dd_spd_inverse_pallas,
    dd_spd_inverse_pallas_wide,
)
from clrs_tpu.ops.xfloat import XF

platform = jax.default_backend()
dtype = np.float32 if platform == "tpu" else np.float64
interpret = platform != "tpu"
print(f"platform={platform} dtype={np.dtype(dtype).name} reps={reps}")

rng = np.random.default_rng(0)


def make_batch(B, n):
    out = np.zeros((B, 2, n, n), dtype)
    for b in range(B):
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        A = (Q * np.logspace(0, 4, n)) @ Q.T
        out[b, 0] = ((A + A.T) / 2).astype(dtype)
    return jnp.asarray(out)


@jax.jit
def run_xla(limbs):  # (B, 2, n, n)
    inv, ok = jax.vmap(xf_spd_inverse)(XF(jnp.swapaxes(limbs, 0, 1)))
    return jnp.swapaxes(inv.limbs, 0, 1), ok


run_pallas = jax.jit(lambda x: dd_spd_inverse_pallas(x, interpret=interpret))
run_wide = jax.jit(lambda x: dd_spd_inverse_pallas_wide(x, interpret=interpret))


def timeit(fn, x):
    out = fn(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return dt, out


for B, n in [(7, 4), (31, 8), (24, 16), (8, 32), (4, 64), (64, 16)]:
    x = make_batch(B, n)
    row = [f"B={B:3d} n={n:3d}"]
    ref = None
    for name, fn in [("xla", run_xla), ("pallas", run_pallas), ("wide", run_wide)]:
        try:
            dt, (inv, ok) = timeit(fn, x)
            inv = np.asarray(inv, np.float64)
            assert bool(np.all(np.asarray(ok))), name
            if ref is None:
                ref = inv
                err = 0.0
            else:
                err = np.max(np.abs(inv - ref)) / max(np.max(np.abs(ref)), 1e-30)
            row.append(f"{name}={dt*1e6:9.1f}us (relerr {err:.1e})")
        except Exception as e:  # noqa: BLE001
            row.append(f"{name}=FAIL({type(e).__name__})")
    print("  ".join(row), flush=True)
