"""Measure the scaled-mode EFT-barrier cost at high k (VERDICT r4 item 6).

Scaled mode re-imposes optimization barriers on TPU (xfloat._barriers_off:
XLA:TPU's simplifier DOES break EFTs in the scaled series graphs), which
forfeits the round-1 barrier-off fusion win exactly in the high-k regime
the on-chip contract needs.  This bench quantifies that cost on a
representative elementwise cascade chain (the XLA-side leftovers of a
phase graph after matmul/Schur/inverse/steplength became custom-calls)
and A/Bs the mitigation: absorbing the ops into the generic elementwise
k-limb Pallas kernel (CLRS_XF_ELEMWISE_PALLAS_MIN_K, xfloat.py:674-680).

Variants:
  barriers   scaled default: XLA expansion cascades, barriers ON
  bare       barriers forced OFF (documents the correctness breakage:
             values are checked vs mpmath — expected to LOSE precision)
  elemwise   ops dispatched to the Pallas elemwise kernel (no barriers
             inside Mosaic — lowers arithmetic as written)

Usage: python scripts/bench_scaled_barriers.py [k] [n] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

k = int(sys.argv[1]) if len(sys.argv) > 1 else 14
n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 7

import jax
import jax.numpy as jnp
import mpmath
import numpy as np

import clrs_tpu  # noqa: F401
import clrs_tpu.ops.xfloat as XFM
from clrs_tpu.ops.xfloat import XF, scaled_mode, xf_add, xf_from_mp, xf_mul, xf_to_mp

S = 24
platform = jax.default_backend()
print(f"platform={platform} k={k} n={n} S={S} reps={reps}", flush=True)

mpmath.mp.prec = S * k + 300
rng = np.random.default_rng(0)


def rand_mp(shape):
    base = rng.standard_normal(shape)
    tiny = rng.standard_normal(shape)
    flat = [mpmath.mpf(float(b)) * (1 + mpmath.mpf(float(t)) * mpmath.mpf(2) ** -200)
            for b, t in zip(base.ravel(), tiny.ravel())]
    return np.array(flat, dtype=object).reshape(shape)


Am = rand_mp((n, n))
Bm = rand_mp((n, n))

with scaled_mode(S):
    Ax = xf_from_mp(Am, k=k, dtype=np.float32)
    Bx = xf_from_mp(Bm, k=k, dtype=np.float32)


def chain(a, b):
    # 4 muls + 4 adds — the mix of a residual/update phase's leftovers
    t = xf_mul(a, b)
    t = xf_add(t, a)
    t = xf_mul(t, b)
    t = xf_add(t, b)
    t = xf_mul(t, a)
    t = xf_add(t, a)
    t = xf_mul(t, b)
    t = xf_add(t, b)
    return t


# mpmath reference of the same chain
Tm = Am * Bm
Tm = Tm + Am
Tm = Tm * Bm
Tm = Tm + Bm
Tm = Tm * Am
Tm = Tm + Am
Tm = Tm * Bm
Tm = Tm + Bm


def relerr(x: XF) -> float:
    got = np.array(xf_to_mp(x.reshape((-1,))), dtype=object)
    want = Tm.ravel()
    sc = max(abs(v) for v in want)
    return float(max(abs(g - w) for g, w in zip(got, want)) / sc)


def run(tag):
    def f(al, bl):
        with scaled_mode(S):
            return chain(XF(al), XF(bl)).limbs

    jf = jax.jit(f)
    t0 = time.perf_counter()
    out = jax.block_until_ready(jf(Ax.limbs, Bx.limbs))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(jf(Ax.limbs, Bx.limbs))
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    with scaled_mode(S):
        err = relerr(XF(out))
    bits = -np.log2(err) if err > 0 else S * k
    print(f"{tag:9s} med {med * 1e3:8.2f} ms  compile {comp:6.1f}s  "
          f"relerr {err:.2e} (~{bits:.0f} bits)", flush=True)
    return med


# 1. scaled default: barriers ON
XFM._NO_BARRIERS_ENV = ""
XFM._NO_BARRIERS = None
XFM._ELEMWISE_PALLAS_MIN_K = 0
t_bar = run("barriers")

# 2. barriers forced OFF (correctness hazard being documented)
XFM._NO_BARRIERS_ENV = "1"
XFM._NO_BARRIERS = True
t_bare = run("bare")

# 3. elemwise Pallas kernels absorb the ops
XFM._NO_BARRIERS_ENV = ""
XFM._NO_BARRIERS = None
XFM._ELEMWISE_PALLAS_MIN_K = min(k, 10)
t_elem = run("elemwise")

print(f"\nbarrier cost: bare is {t_bar / t_bare:.2f}x faster than barriered "
      f"(upper bound); elemwise-Pallas is {t_bar / t_elem:.2f}x vs barriered "
      f"at full precision", flush=True)
