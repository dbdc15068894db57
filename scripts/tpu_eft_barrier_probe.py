"""Probe: do error-free transforms survive on this backend WITHOUT
optimization barriers (optionally with --xla_allow_excess_precision=false)?

The barriers in ops/xfloat.py (two_sum / fast_two_sum / split) exist because
XLA's algebraic simplifier can rewrite (a+b)-a -> b, destroying the rounding
error the EFT captures.  Each barrier also breaks FUSION, so every dd op
round-trips HBM on TPU.  If a flag (or the backend's default behavior)
preserves EFTs bare, the whole iteration fuses and kernel count collapses.

Usage:
  python scripts/tpu_eft_barrier_probe.py            # default flags
  CLRS_XF_NO_BARRIERS=1 python scripts/tpu_eft_barrier_probe.py
  CLRS_XF_NO_BARRIERS=1 XLA_FLAGS="--xla_allow_excess_precision=false" \
      python scripts/tpu_eft_barrier_probe.py

Exercises the EFTs in the contexts where rewrites actually fire: standalone
jit, inside fused chains, inside lax.scan / fori_loop bodies, and inside a
dd matmul contraction.  Compares against mpmath on the host.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import clrs_tpu  # noqa: F401  (sets XLA flags)
from clrs_tpu.ops import xfloat as xfl
from clrs_tpu.ops.xfloat import XF, xf_add, xf_mul, xf_matmul, xf_to_mp

import mpmath

mpmath.mp.prec = 300


def check(name, got_xf, want_mp, tol):
    got = xf_to_mp(got_xf)
    rel = 0.0
    for g, w in np.nditer([got, np.asarray(want_mp, dtype=object)],
                          flags=["refs_ok"]):
        g = g.item()
        w = w.item()
        denom = abs(w) if abs(w) > 0 else mpmath.mpf(1)
        rel = max(rel, float(abs(g - w) / denom))
    status = "OK " if rel <= tol else "FAIL"
    print(f"  [{status}] {name}: max rel err {rel:.3e} (tol {tol:.1e})")
    return rel <= tol


def main():
    platform = jax.default_backend()
    dtype = jnp.float32 if platform == "tpu" else jnp.float64
    k = 2
    # dd-f32 unit ~ 2^-48 ~ 3.6e-15 ; dd-f64 ~ 2^-106 ~ 1.2e-32
    tol = 3e-14 if dtype == jnp.float32 else 1e-31
    print(f"platform={platform} dtype={np.dtype(dtype).name} "
          f"barriers={'OFF' if os.environ.get('CLRS_XF_NO_BARRIERS') else 'ON'} "
          f"XLA_FLAGS={os.environ.get('XLA_FLAGS','')!r}")

    rng = np.random.default_rng(0)
    n = 16
    # values with wide dynamic range so lo limbs matter
    a_np = (rng.standard_normal((n, n)) * 10.0 ** rng.integers(-6, 6, (n, n)))
    b_np = (rng.standard_normal((n, n)) * 10.0 ** rng.integers(-6, 6, (n, n)))
    a_np = a_np.astype(np.dtype(dtype).name)
    b_np = b_np.astype(np.dtype(dtype).name)
    # lo limbs: scaled-down second draws
    alo = (a_np * np.asarray(2.0 ** -30, a_np.dtype)).astype(a_np.dtype)
    blo = (b_np * np.asarray(2.0 ** -29, b_np.dtype)).astype(b_np.dtype)
    A = XF(jnp.stack([jnp.asarray(a_np), jnp.asarray(alo)]))
    B = XF(jnp.stack([jnp.asarray(b_np), jnp.asarray(blo)]))
    Amp = xf_to_mp(A)
    Bmp = xf_to_mp(B)

    ok = True

    # 1. fused elementwise chain: (A*B + A) * B - A
    f = jax.jit(lambda A, B: xf_add(xf_mul(xf_add(xf_mul(A, B), A), B), -A))
    want = (Amp * Bmp + Amp) * Bmp - Amp
    ok &= check("elementwise chain", f(A, B), want, tol)

    # 2. scan body: s <- s*B + A  repeated 5x (Horner-like)
    def scan_fn(A, B):
        def body(s, _):
            return xf_add(xf_mul(XF(s), B), A).limbs, None
        out, _ = jax.lax.scan(body, XF.zeros((n, n), k=k, dtype=dtype).limbs,
                              None, length=5)
        return XF(out)
    want = np.zeros((n, n), dtype=object)
    for _ in range(5):
        want = want * Bmp + Amp
    ok &= check("scan Horner x5", jax.jit(scan_fn)(A, B), want, tol)

    # 3. dd matmul (tree-sum contraction)
    want = Amp @ Bmp
    ok &= check("matmul 16x16", jax.jit(xf_matmul)(A, B), want,
                tol * 50)  # contraction amplifies

    # 4. dot with catastrophic cancellation: x . y where sum ~ 0
    x_np = np.ones(64, dtype=np.dtype(dtype).name)
    y_np = np.concatenate([np.ones(32), -np.ones(32)]).astype(x_np.dtype)
    xx = XF.from_float(jnp.asarray(x_np) * (1 + jnp.arange(64, dtype=dtype) * dtype(2**-20)), k=k)
    yy = XF.from_float(jnp.asarray(y_np), k=k)
    want = (xf_to_mp(xx) * xf_to_mp(yy)).sum()
    got = jax.jit(lambda u, v: xfl.xf_dot(u, v))(xx, yy)
    ok &= check("cancelling dot", got.reshape((1,)), np.asarray([want], dtype=object),
                tol * 64)

    print("RESULT:", "ALL OK" if ok else "EFT BROKEN")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
