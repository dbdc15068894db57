"""Characterization of the scaled-mode SPARSE-LIMB accuracy floor
(round-5 finding, logs/validate_k22_r5.log).

Scaled add/mul are full-precision for DENSE limb content (every limb
populated: k=22 measured 2^-549..2^-556 vs a 528-bit budget on both CPU
and v5e), but inputs with RUNS OF ZERO LIMBS (value = x*(1 + 2^-deep))
lose ~72 bits (3 limbs) at any k >= 12: measured 2^-(24k-72) +- a few
bits at k in {12, 16, 20, 22}, identically on the XLA expansion path.

Mechanism (read from ops/xfloat.py _vec_sum_sc): when terms[i] is zero,
two_sum(0*up, s) passes the running sum s through undeposited, and the
subsequent `s * down` re-scales the SAME content one level shallower;
across a run of z zero limbs the content is down-scaled z times, and
once its stored magnitude crosses f32's subnormal zone (~2^-126 normal
floor, 2^-149 denormal) the low bits are squashed.  Dense content never
triggers this because every two_sum against an O(1) term deposits the
deep content into the error limb at its proper level.

The fix (deposit the down-scale residual: r = s2 - (s2*down)*up, exact
by Sterbenz, added into out[i+1]) must land in all THREE substrate
mirrors together (ops/xfloat.py _vec_sum_sc + _renorm_chain_sc, the
Pallas _XOps cascades in ops/pallas_xf.py, native/xfkern.cpp sc_*) or
the cross-substrate bit-identity tests break — deferred with the sketch
recorded here (TODO.md round-5).

These tests PIN the current behavior so a future fix shows up as an
intentional change: dense stays full-precision, sparse stays at-or-
better-than the 24k-72 floor (a fix will tighten sparse toward full
precision and these asserts stay green).
"""
import sys

import mpmath
import numpy as np
import pytest

import jax

from clrs_tpu.ops.xfloat import scaled_mode, xf_add, xf_from_mp, xf_mul, xf_to_mp

S = 24


def _measure(k: int, sparse: bool):
    bits = S * k
    mpmath.mp.prec = bits + 300
    rng = np.random.default_rng(2)
    n = 8

    def val():
        if sparse:
            return mpmath.mpf(float(rng.standard_normal())) * (
                1 + mpmath.mpf(2) ** -(bits - 60))
        return mpmath.mpf(float(rng.standard_normal())) * (
            1 + sum(mpmath.mpf(float(rng.random())) * mpmath.mpf(2) ** -(S * i)
                    for i in range(1, k)))

    Am = np.array([val() for _ in range(n)], dtype=object)
    Bm = np.array([val() for _ in range(n)], dtype=object)
    with scaled_mode(S):
        Ax = xf_from_mp(Am, k=k, dtype=np.float32)
        Bx = xf_from_mp(Bm, k=k, dtype=np.float32)
        Sx = np.array(xf_to_mp(xf_add(Ax, Bx)), dtype=object)
        Px = np.array(xf_to_mp(xf_mul(Ax, Bx)), dtype=object)
    es = max(abs(g - w) / abs(w) for g, w in zip(Sx, Am + Bm))
    ep = max(abs(g - w) / abs(w) for g, w in zip(Px, Am * Bm))
    return es, ep


@pytest.mark.parametrize("k", [12, 22])
def test_dense_limb_content_full_precision(k):
    """Dense expansions: both ops within ~16 bits of the 24k budget."""
    es, ep = _measure(k, sparse=False)
    budget = mpmath.mpf(2) ** -(S * k - 16)
    assert es < budget, f"dense add err {es} above 2^-{S*k-16}"
    assert ep < budget, f"dense mul err {ep} above 2^-{S*k-16}"


@pytest.mark.parametrize("k", [12, 22])
def test_sparse_limb_floor_pinned(k):
    """Sparse expansions: no worse than the measured 24k-72 floor
    (a future _vec_sum_sc residual-deposit fix only tightens this)."""
    es, ep = _measure(k, sparse=True)
    floor = mpmath.mpf(2) ** -(S * k - 72 - 8)  # 8 bits of slack
    assert es < floor, f"sparse add err {es} breached the pinned floor"
    assert ep < floor, f"sparse mul err {ep} breached the pinned floor"
