"""Roofline: synthetic single-huge-cluster decomposition stages
(VERDICT r3 item 4 / SURVEY §5.7 large-cluster regime).

The reference's application class keeps dim_S <= ~10^2, where iteration
rate is launch-latency-bound (BASELINE.md MFU note).  This bench runs the
decomposition pipeline stages on ONE synthetic cluster at sizes where the
kernels see real arithmetic intensity — bs (= delta, m=1) 256-512 and
dim_S (= K samples, rmax=1) ~10^3 — and reports achieved GFLOP/s vs the
VPU f32 peak (utils/flops.py model, which counts the hardware flops the
expansion cascades actually execute), plus a bytes-based arithmetic-
intensity estimate to name the bottleneck (VPU vs HBM vs launch).

Stages (the compute_decomposition pipeline, MPMP.jl:1218-1514 analogue):
  pairings  2x compute_pairings (tiled Pallas k-limb matmuls on TPU)
  schur     schur_block_contribution (row-tiled fused Pallas elementwise)
  factor    xf_spd_inverse of the (dim_S, dim_S) Schur block (XLA loop)
  matmul    one (n x n x n) k-limb matmul at n = delta (pure-kernel point)

Usage: python scripts/bench_roofline.py [k] [delta] [K] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

k = int(sys.argv[1]) if len(sys.argv) > 1 else 2
delta = int(sys.argv[2]) if len(sys.argv) > 2 else 512
K = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5

import jax
import jax.numpy as jnp
import numpy as np

import clrs_tpu  # noqa: F401
from clrs_tpu.core.kernels import compute_pairings, schur_block_contribution
from clrs_tpu.ops.linalg import xf_spd_inverse
from clrs_tpu.ops.xfloat import XF, xf_matmul
from clrs_tpu.utils import flops as FL

platform = jax.default_backend()
dtype = np.float32 if platform == "tpu" else np.float64
use_mxu = "pallas" if platform == "tpu" else False
m, rmax = 1, 1
T = K * rmax
dim = (m * (m + 1) // 2) * K
dev = jax.devices()[0]
peak = FL.vpu_peak_flops(getattr(dev, "device_kind", ""))
# v5e HBM ~ 810 GB/s; CPU number is irrelevant (we only bench TPU here)
hbm_bw = 810e9
print(f"platform={platform} k={k} delta={delta} K={K} T={T} dim_S={dim} "
      f"dtype={np.dtype(dtype).name} reps={reps}")

rng = np.random.default_rng(0)


def rand_xf(shape):
    """Normalized-magnitude synthetic limbs: limb q ~ N(0,1) * ulp^q.
    Timing-equivalent to real expansions (no data-dependent control
    flow in any kernel)."""
    ulp = 2.0 ** -22 if dtype == np.float32 else 2.0 ** -50
    l = np.stack([rng.standard_normal(shape) * ulp ** q for q in range(k)])
    return XF(jnp.asarray(l, dtype))


def spd_xf(n):
    M = rng.standard_normal((n, n))
    A = (M @ M.T) / n + np.eye(n) * n
    l = np.zeros((k, n, n))
    l[0] = A
    return XF(jnp.asarray(l, dtype))


Z_X = spd_xf(m * delta)
Z_Y = spd_xf(m * delta)
V = rand_xf((delta, T))
H = rand_xf((T,))
S_spd = spd_xf(dim)


def run_stage(name, fn, args, nflops, nbytes):
    jf = jax.jit(fn)
    t0 = time.perf_counter()
    out = jax.block_until_ready(jf(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(jf(*args))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    gfs = nflops / med / 1e9
    pct = nflops / med / peak * 100
    ai = nflops / nbytes
    hbm_floor = nbytes / hbm_bw
    bound = "VPU" if ai > peak / hbm_bw else "HBM"
    if med < 3 * hbm_floor and bound == "VPU":
        bound = "VPU/HBM-mixed"
    print(f"{name:9s} med {med*1e3:9.2f} ms  {gfs:8.1f} GFLOP/s "
          f"= {pct:5.2f}% VPU peak  AI {ai:6.1f} fl/B  "
          f"HBM floor {hbm_floor*1e3:6.2f} ms  -> {bound}"
          f"   (compile {compile_s:.0f}s)")
    return out, med


esz = np.dtype(dtype).itemsize

# --- pairings: two tensors, two matmuls each ---------------------------
pair_fl = 2 * (FL.matmul_flops(m * delta * m, delta, T, k)
               + FL.matmul_flops(T, delta, m * m * T, k))
pair_by = esz * k * 2 * (delta * delta + 2 * delta * T + 2 * m * T * m * T)


def pairings(zx, zy, v):
    return (compute_pairings(zx, v, m, use_mxu),
            compute_pairings(zy, v, m, use_mxu))


(PX, PY), _ = run_stage("pairings", pairings, (Z_X, Z_Y, V),
                        pair_fl, pair_by)

# --- Schur elementwise assembly ---------------------------------------
np_ = m * (m + 1) // 2
schur_fl = (np_ * np_ * T * T * (5 * FL.mul_flops(k) + 4 * FL.add_flops(k))
            + T * T * FL.mul_flops(k))
schur_by = esz * k * T * T * (np_ * np_ * (8 + 1) + 1)


def schur(px, py, h):
    return schur_block_contribution(px, py, h, m, K, rmax, use_mxu)


S_out, _ = run_stage("schur", schur, (PX, PY, H), schur_fl, schur_by)

# --- factorization (SPD inverse of S) ---------------------------------
fact_fl = FL.spd_inverse_flops(dim, k)
fact_by = esz * k * 2 * dim * dim


def factor(s):
    inv, ok = xf_spd_inverse(s)
    return inv


run_stage("factor", factor, (S_spd,), fact_fl, fact_by)

# --- pure-kernel matmul point -----------------------------------------
A_mm = rand_xf((delta, delta))
B_mm = rand_xf((delta, delta))
mm_fl = FL.matmul_flops(delta, delta, delta, k)
mm_by = esz * k * 3 * delta * delta


def mm(a, b):
    if use_mxu == "pallas":
        from clrs_tpu.ops.pallas_xf import xf_matmul_pallas

        return xf_matmul_pallas(a, b)
    return xf_matmul(a, b)


run_stage("matmul", mm, (A_mm, B_mm), mm_fl, mm_by)

print(f"\nVPU f32 peak used: {peak/1e12:.2f} TFLOP/s "
      f"({getattr(dev, 'device_kind', platform)}); HBM {hbm_bw/1e9:.0f} GB/s")
