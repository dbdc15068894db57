"""Kernel-level validation of a scaled-f32 rung on the current backend
(VERDICT r4 item 9: the k=22 rung = 528 bits, true setprecision(512)
parity with the reference's default regime, MPMP.jl:17 — validated the
same way the k=14 rung was in round 4: the Pallas SPD-inverse kernel
must reconstruct A @ A^-1 = I to the full expansion precision on
hardware, and the Pallas matmul must match mpmath).

Usage: python scripts/validate_scaled_k.py [k] [n] [cond_decades]
  k   scaled-f32 limb count (default 22 ~ 528 bits; 14 ~ 336)
  n   matrix order (default 16; multiples of 8 lower cleanly)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

k = int(sys.argv[1]) if len(sys.argv) > 1 else 22
n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
cond_dec = int(sys.argv[3]) if len(sys.argv) > 3 else 12

import jax
import mpmath
import numpy as np

import clrs_tpu  # noqa: F401
from clrs_tpu.ops.pallas_xf import xf_matmul_pallas, xf_spd_inverse_pallas_k
from clrs_tpu.ops.xfloat import XF, scaled_mode, xf_from_mp, xf_to_mp

S = 24
bits = S * k
platform = jax.default_backend()
interpret = platform != "tpu"
mpmath.mp.prec = bits + 300
print(f"platform={platform} k={k} (~{bits} bits scaled f32) n={n} "
      f"cond~1e{cond_dec} interpret={interpret}", flush=True)

rng = np.random.default_rng(0)
M = rng.standard_normal((n, n))
scales = 10.0 ** (-np.linspace(0, cond_dec / 2, n))
Am = np.empty((n, n), dtype=object)
for i in range(n):
    for j in range(n):
        Am[i, j] = sum(
            mpmath.mpf(float(M[i, t] * scales[t]))
            * mpmath.mpf(float(M[j, t] * scales[t]))
            for t in range(n)
        ) + (mpmath.mpf(10) ** -cond_dec if i == j else 0)

with scaled_mode(S):
    Ax = xf_from_mp(Am, k=k, dtype=np.float32)

    # --- fused SPD inverse ------------------------------------------------
    t0 = time.time()
    inv, ok = xf_spd_inverse_pallas_k(
        np.asarray(Ax.limbs)[None], interpret=interpret
    )
    inv = jax.block_until_ready(inv)
    print(f"spd-inverse compile+run {time.time() - t0:.1f}s "
          f"ok={bool(np.asarray(ok)[0])}", flush=True)
    Im = np.array(
        xf_to_mp(XF(np.asarray(inv)[0]).reshape((-1,))), dtype=object
    ).reshape(n, n)
    resid = max(
        abs(sum(Am[i][t] * Im[t, j] for t in range(n))
            - (1 if i == j else 0))
        for i in range(n) for j in range(n)
    )
    lb = mpmath.log(resid, 2) if resid > 0 else -mpmath.mpf(bits + 300)
    print(f"reconstruction |A A^-1 - I|_max = 2^{float(lb):.0f} "
          f"(budget 2^-{bits}, cond eats ~{int(cond_dec * 3.33)} bits)",
          flush=True)

    # --- matmul vs mpmath -------------------------------------------------
    Bm = np.empty((n, n), dtype=object)
    N2 = rng.standard_normal((n, n))
    for i in range(n):
        for j in range(n):
            Bm[i, j] = (mpmath.mpf(float(N2[i, j]))
                        * (1 + mpmath.mpf(2) ** -400))
    Bx = xf_from_mp(Bm, k=k, dtype=np.float32)
    t0 = time.time()
    Cx = jax.block_until_ready(xf_matmul_pallas(Ax, Bx,
                                                interpret=interpret).limbs)
    print(f"matmul compile+run {time.time() - t0:.1f}s", flush=True)
    Cm = np.array(xf_to_mp(XF(Cx).reshape((-1,))), dtype=object).reshape(n, n)
    want = Am @ Bm
    sc = max(abs(v) for v in want.ravel())
    merr = max(abs(g - w) for g, w in zip(Cm.ravel(), want.ravel())) / sc
    ml = mpmath.log(merr, 2) if merr > 0 else -mpmath.mpf(bits + 300)
    print(f"matmul relerr = 2^{float(ml):.0f} (budget ~2^-{bits})",
          flush=True)

pass_inv = resid < mpmath.mpf(2) ** -(bits - int(cond_dec * 3.33) - 30)
pass_mm = merr < mpmath.mpf(2) ** -(bits - 40)
print(f"\nVERDICT: spd-inverse {'PASS' if pass_inv else 'FAIL'}, "
      f"matmul {'PASS' if pass_mm else 'FAIL'}", flush=True)
