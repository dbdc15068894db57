"""Fused Pallas TPU matmul for double-double (2-limb) expansions.

The XLA expansion matmul (ops/xfloat.py xf_matmul) materializes an
(n, K, m) product tensor and tree-sums it with ~log2(K) dd adds, each of
which is fenced by optimization barriers (EFT protection) — so XLA cannot
fuse the chain, and every two_sum round-trips HBM.  This kernel runs the
whole contraction as outer-product accumulation in VMEM with no barriers
(Mosaic lowers arithmetic as written — see ops/pallas_dd.py EFT-safety
note): grid (batch, K/8), each step dd-accumulates 8 rank-1 updates
C += a_k ⊗ b_k into a VMEM scratch accumulator, written out on the last
step.

Layout strategy (Mosaic lowering rules, learned in ops/pallas_dd.py +
here): block last-two dims must be (8, 128)-divisible or full; dynamic
indexing only on untiled leading axes; no cross-layout transposes in the
kernel.  An outer product needs one operand on sublanes and one on
lanes, so the host passes A column-major with a trailing size-1 lane
axis (A5: (2, B, K, n, 1)) — each grid step receives 8 columns as
(n, 1) sublane vectors and 8 rows of B as (1, m) lane vectors, and the
(n, 1) x (1, m) broadcast is native.  The host-side transpose/reshape
of A is a layout no-op compared to the HBM traffic the fusion removes.

Replaces the reference's Arblib.approx_mul! (18 call sites, e.g.
MPMP.jl:1291-1311) on the TPU hot path (pairings / weighted-A / dX·Y
products), behind SolverConfig.use_pallas_matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clrs_tpu.ops.pallas_dd import _Ops
from clrs_tpu.ops.xfloat import XF

# index-map components must be int32: python-int 0 becomes i64 under
# jax_enable_x64 and Mosaic cannot legalize an i64-returning index map
_i0 = np.int32(0)

_KC = 8  # default columns of A (rows of B) accumulated per grid step


def _pick_kc(K: int) -> int:
    """Chunk size for the contraction axis: one grid step when K is small
    (grid-step overhead dominates tiny blocks), 8-column steps otherwise
    (bounds VMEM for the lane-padded A-column block)."""
    Kp8 = ((K + 7) // 8) * 8
    return Kp8 if Kp8 <= 32 else _KC


def _matmul_kernel(a5_ref, b_ref, out_ref, acc, *, kc: int, barrier: bool):
    """Grid step (b, kk): C[b] += sum_{r<kc} A[:, kc*kk+r] * B[kc*kk+r, :].

    The accumulator is ONE stacked (2, n, m) scratch, not separate hi/lo
    buffers: in interpret mode the grid becomes an XLA:CPU loop whose
    carried state is the scratch, and at backend optimization level >= 1
    XLA:CPU value-changes loop bodies carrying a TUPLE of separate arrays
    (lo limbs degrade to ~1e-16; barriers do not protect) — the stacked
    layout is immune.  On hardware (Mosaic) both layouts are bit-exact.
    """
    ops = _Ops(barrier)
    kk = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kk == 0)
    def _():
        acc[:, :, :] = jnp.zeros_like(acc)

    ch, cl = acc[0], acc[1]
    for r in range(kc):  # static unroll
        ach = a5_ref[0, 0, r]  # (n, 1) sublane vector
        acl = a5_ref[1, 0, r]
        brh = b_ref[0, 0, r : r + 1, :]  # (1, m) lane vector
        brl = b_ref[1, 0, r : r + 1, :]
        # dd outer product a ⊗ b, broadcast (n, 1) x (1, m)
        ph, pe = ops.two_prod(ach, brh)  # (n, m)
        plo = pe + (ach * brl + acl * brh)
        ph, plo = ops.fast_two_sum(ph, plo)
        ch, cl = ops.add(ch, cl, ph, plo)
    acc[0] = ch
    acc[1] = cl

    @pl.when(kk == nk - 1)
    def _():
        out_ref[0, 0] = ch
        out_ref[1, 0] = cl


@functools.partial(jax.jit, static_argnames=("interpret",))
def _matmul_batched(a_limbs: jnp.ndarray, b_limbs: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """a_limbs: (2, B, n, K), b_limbs: (2, B, K, m) -> (2, B, n, m)."""
    _, B, n, K = a_limbs.shape
    m = b_limbs.shape[-1]
    dtype = a_limbs.dtype
    kc = _pick_kc(K)
    Kp = ((K + kc - 1) // kc) * kc
    if Kp != K:  # zero-pad the contraction axis (exact)
        a_limbs = jnp.pad(a_limbs, ((0, 0),) * 3 + ((0, Kp - K),))
        b_limbs = jnp.pad(b_limbs, ((0, 0),) * 2 + ((0, Kp - K), (0, 0)))
    # columns of A as (n, 1) sublane vectors: (2, B, Kp, n, 1)
    a5 = a_limbs.transpose(0, 1, 3, 2)[..., None]
    kern = functools.partial(_matmul_kernel, kc=kc, barrier=interpret)
    return pl.pallas_call(
        kern,
        grid=(B, Kp // kc),
        in_specs=[
            pl.BlockSpec((2, 1, kc, n, 1),
                         lambda b, kk: (_i0, b, kk, _i0, _i0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, kc, m),
                         lambda b, kk: (_i0, b, kk, _i0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, n, m), lambda b, kk: (_i0, b, _i0, _i0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, B, n, m), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, n, m), dtype),
        ],
        interpret=interpret,
    )(a5, b_limbs)


def xf_matmul_pallas(a: XF, b: XF, interpret: bool = False) -> XF:
    """Fused dd matmul: (..., n, K) x (..., K, m) -> (..., n, m).

    Requires k == 2 limbs (dd).  Leading batch dims of a and b must
    broadcast; both are materialized to the broadcast batch.
    """
    assert a.k == 2 and b.k == 2, (a.k, b.k)
    assert a.ndim >= 2 and b.ndim >= 2, (a.shape, b.shape)
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    n, K = a.shape[-2:]
    K2, m = b.shape[-2:]
    assert K == K2, (a.shape, b.shape)
    al = jnp.broadcast_to(a.limbs, (2,) + batch + (n, K))
    bl = jnp.broadcast_to(b.limbs, (2,) + batch + (K, m))
    B = 1
    for d in batch:
        B *= d
    out = _matmul_batched(
        al.reshape(2, B, n, K), bl.reshape(2, B, K, m), interpret=interpret
    )
    return XF(out.reshape((2,) + batch + (n, m)))
