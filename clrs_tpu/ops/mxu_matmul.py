"""Extended-precision matmul on the TPU MXU via integer-slice splitting.

The Ozaki-scheme idea: an extended-precision matrix product is computed
EXACTLY as a sum of small integer matrix products.  Each row of A (column
of B) is scaled by a power of two into [-1, 1), sliced into S chunks of 7
bits, and the chunk products ride the MXU as int8 x int8 -> int32 dots
(int32 accumulation is exact — verified on this TPU's MXU; f32 matmuls
there are bf16-grade and f64 is emulated, so integer dots are the ONLY
full-precision MXU path).  Partial products are reconstructed into XF
limbs grouped by diagonal s1+s2 with exponent bookkeeping.

Error: pairs with s1+s2 >= S are dropped, giving
  |C - C_exact| <= K * rowscale_i * colscale_j * 2^(-7S+2)
— the same absolute-to-scale class as any backward-stable matmul, with S
chosen so 7S covers the limb precision (S=16 for double-double, 23 for
k=3, 31 for k=4).

This replaces the reference's Arblib.approx_mul! hot path at MXU speed
(SURVEY.md §2.9; the pairing products MPMP.jl:1272-1318 dominate the
Schur build).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from clrs_tpu.ops.xfloat import XF, xf_add, xf_ldexp


_BITS = 7  # bits per slice; |q| <= 2^6 + 1 fits int8 with carry slack


def _default_slices(k: int, limb_dtype) -> int:
    mant = 53 if limb_dtype == jnp.float64 else 24
    return math.ceil((mant * k + _BITS) / _BITS)


def _row_exponents(a: XF, axis: int) -> jnp.ndarray:
    """Power-of-two scale of the max |entry| along `axis` (hi limbs).

    frexp lowers to 64-bit bitcasts that the TPU x64 rewriter rejects, so
    the exponent comes from an approximate log2 corrected by one exact
    comparison (scaling by 2^e itself is exact via ldexp).
    """
    from clrs_tpu.ops.xfloat import pow2

    mx = jnp.max(jnp.abs(a.limbs[0]), axis=axis)
    mx = jnp.where(mx > 0, mx, 1.0)
    e = jnp.floor(jnp.log2(mx)).astype(jnp.int32) + 1
    # correct off-by-one from log2 rounding: want mx * 2^-e <= 1 < mx * 2^-(e-1)
    scaled = mx * pow2(-e, mx.dtype)
    e = jnp.where(scaled > 1.0, e + 1, e)
    e = jnp.where(scaled <= 0.5, e - 1, e)
    return e


def _slice_int(a: XF, e: jnp.ndarray, axis: int, slices: int):
    """Split a into int8 slices: a = 2^e * sum_s q_s 2^(-7(s+1)) + O(2^(-7S)).

    e broadcasts along `axis`.  Returns [S] list of int8 arrays.
    """
    eb = jnp.expand_dims(e, axis)
    r = xf_ldexp(a, -eb)  # |r| <= 1
    qs = []
    for _ in range(slices):
        r = XF(r.limbs * (2.0**_BITS))
        q = jnp.round(r.limbs[0])
        r = xf_add(r, XF.from_float(-q, k=1, dtype=a.dtype))
        qs.append(q.astype(jnp.int8))
    return qs


def xf_matmul_mxu(a: XF, b: XF, slices: Optional[int] = None) -> XF:
    """C = A @ B with integer-sliced MXU dots; A (n, K), B (K, m) -> (n, m)."""
    assert a.ndim == 2 and b.ndim == 2
    k = max(a.k, b.k)
    dtype = a.dtype
    if slices is None:
        slices = _default_slices(k, dtype)

    ea = _row_exponents(a, axis=1)  # (n,)
    eb = _row_exponents(b, axis=0)  # (m,)
    qa = _slice_int(a, ea, axis=1, slices=slices)  # each (n, K)
    qb = _slice_int(b, eb, axis=0, slices=slices)  # each (K, m)

    # group exact int32 partial sums by diagonal d = s1 + s2
    diag_sums = []
    for d in range(slices):
        acc = None
        for s1 in range(d + 1):
            s2 = d - s1
            if s1 >= slices or s2 >= slices:
                continue
            p = jax.lax.dot_general(
                qa[s1],
                qb[s2],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = p if acc is None else acc + p
        diag_sums.append(acc)

    # reconstruct: C = 2^(ea_i + eb_j) * sum_d diag_d * 2^(-7(d+2))
    # int32 -> exact XF conversion (<= 31 bits needs 2 f32 limbs or 1 f64)
    out = None
    for d, acc in enumerate(diag_sums):
        if dtype == jnp.float64:
            hi = acc.astype(jnp.float64)
            limbs = [hi] + [jnp.zeros_like(hi)] * (k - 1)
        else:
            hi = acc.astype(jnp.float32)
            lo = (acc - hi.astype(jnp.int32)).astype(jnp.float32)
            limbs = [hi, lo] + [jnp.zeros_like(hi)] * (k - 2)
        term = XF.from_limb_list(limbs)
        term = xf_ldexp(term, -_BITS * (d + 2))
        out = term if out is None else xf_add(out, term)

    scale = ea[:, None] + eb[None, :]
    return xf_ldexp(out, scale)
