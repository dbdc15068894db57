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


class _XOps:
    """K-limb expansion primitives on LISTS of limb arrays, for use inside
    Pallas kernel bodies (any k >= 2; the limb count is a Python-static
    kernel parameter, so XLA never sees the unrolled cascades — only the
    one custom-call.  This is the same compile-wall dodge as
    native/xfkern.cpp, on-device).

    The algorithms are ops/xfloat.py's per-order error cascades
    (_cascade_add / _cascade_mul / _vec_sum) restated on plain arrays over
    pallas_dd._Ops primitives with an explicit barrier flag: barrier=True
    in interpret mode (the body inlines into XLA whose simplifier breaks
    EFTs), False under Mosaic (lowers arithmetic as written — verified on
    v5e, see pallas_dd.py EFT-safety note).  k=2 uses the QD dd sequences
    (matches _Ops.add/mul exactly)."""

    def __init__(self, barrier: bool, k: int):
        self.o = _Ops(barrier)
        self.k = k

    def zeros_like(self, x):
        return [jnp.zeros_like(x) for _ in range(self.k)]

    def _vec_sum(self, terms):
        n = len(terms)
        out = [None] * n
        s = terms[n - 1]
        for i in range(n - 2, -1, -1):
            s, e = self.o.two_sum(terms[i], s)
            out[i + 1] = e
        out[0] = s
        return out

    def add(self, al, bl):
        """k-limb add of limb lists (xfloat._cascade_add; _dd_add at k=2).
        Operands must already be broadcast to a common shape."""
        k = self.k
        if k == 2:
            h, l = self.o.add(al[0], al[1], bl[0], bl[1])
            return [h, l]
        s, e = [], []
        for i in range(k - 1):
            si, ei = self.o.two_sum(al[i], bl[i])
            s.append(si)
            e.append(ei)
        vals = [s[0]]
        carry = [e[0]]
        for i in range(1, k - 1):
            v = s[i]
            nxt = []
            for c in carry:
                v, g = self.o.two_sum(v, c)
                nxt.append(g)
            vals.append(v)
            nxt.append(e[i])
            carry = nxt
        top = al[k - 1] + bl[k - 1]
        for c in carry:
            top = top + c
        vals.append(top)
        r = []
        hi, err = self.o.two_sum(vals[0], vals[1])
        r.append(hi)
        for i in range(2, k):
            hi, err = self.o.two_sum(err, vals[i])
            r.append(hi)
        r.append(err)
        return self._vec_sum(r)

    def mul(self, al, bl):
        """k-limb multiply of limb lists (xfloat._cascade_mul; _dd_mul at
        k=2).  Broadcasting between operand shapes is allowed (used for
        the (n, 1) x (1, m) outer products)."""
        k = self.k
        if k == 2:
            h, l = self.o.mul(al[0], al[1], bl[0], bl[1])
            return [h, l]
        groups: list = [[] for _ in range(k)]
        for o in range(k - 1):
            for i in range(o + 1):
                j = o - i
                if i < k and j < k:
                    p, e = self.o.two_prod(al[i], bl[j])
                    groups[o].append(p)
                    if o + 1 < k:
                        groups[o + 1].append(e)
        cheap = None
        for o in (k - 1, k):
            for i in range(o + 1):
                j = o - i
                if i < k and j < k:
                    t = al[i] * bl[j]
                    cheap = t if cheap is None else cheap + t
        if cheap is not None:
            groups[k - 1].append(cheap)
        vals = []
        for o in range(k):
            terms = groups[o]
            if not terms:
                vals.append(jnp.zeros(jnp.broadcast_shapes(
                    al[0].shape, bl[0].shape), al[0].dtype))
                continue
            v = terms[0]
            for t in terms[1:]:
                if o == k - 1:
                    v = v + t
                else:
                    v, g = self.o.two_sum(v, t)
                    groups[o + 1].append(g)
            vals.append(v)
        r = []
        hi, err = self.o.two_sum(vals[0], vals[1])
        r.append(hi)
        for i in range(2, k):
            hi, err = self.o.two_sum(err, vals[i])
            r.append(hi)
        r.append(err)
        return self._vec_sum(r)

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


def _matmul_kernel_k(a5_ref, b_ref, out_ref, acc, *, k: int, kc: int,
                     barrier: bool):
    """k-limb grid step (b, kk): C[b] += sum_{r<kc} A[:, kc*kk+r] ⊗ B[kc*kk+r, :].

    Same layout strategy as _matmul_kernel, with the limb axis widened to
    k and the dd sequences replaced by the _XOps cascades.  The
    accumulator is ONE stacked (k, n, m) scratch (see the tuple-carry
    note on _matmul_kernel)."""
    xo = _XOps(barrier, k)
    kk = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(kk == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    c = [acc[i] for i in range(k)]
    for r in range(kc):  # static unroll
        a_l = [a5_ref[i, 0, r] for i in range(k)]  # (n, 1) sublane vectors
        b_l = [b_ref[i, 0, r : r + 1, :] for i in range(k)]  # (1, m) lanes
        p = xo.mul(a_l, b_l)  # broadcast (n, 1) x (1, m) -> (n, m)
        c = xo.add(c, p)
    for i in range(k):
        acc[i] = c[i]

    @pl.when(kk == nk - 1)
    def _():
        for i in range(k):
            out_ref[i, 0] = c[i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _matmul_batched_k(a_limbs: jnp.ndarray, b_limbs: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """a_limbs: (k, B, n, K), b_limbs: (k, B, K, m) -> (k, B, n, m)."""
    k, B, n, K = a_limbs.shape
    m = b_limbs.shape[-1]
    dtype = a_limbs.dtype
    # smaller contraction chunks than dd: the per-update cascade body is
    # ~k^2/2 two_prods + O(k^2) two_sums, so kc=8 at k>=4 makes very long
    # Mosaic bodies for little gain
    kc = _pick_kc(K) if k <= 3 else min(_pick_kc(K), 4)
    Kp = ((K + kc - 1) // kc) * kc
    if Kp != K:  # zero-pad the contraction axis (exact)
        a_limbs = jnp.pad(a_limbs, ((0, 0),) * 3 + ((0, Kp - K),))
        b_limbs = jnp.pad(b_limbs, ((0, 0),) * 2 + ((0, Kp - K), (0, 0)))
    a5 = a_limbs.transpose(0, 1, 3, 2)[..., None]  # (k, B, Kp, n, 1)
    kern = functools.partial(_matmul_kernel_k, k=k, kc=kc, barrier=interpret)
    return pl.pallas_call(
        kern,
        grid=(B, Kp // kc),
        in_specs=[
            pl.BlockSpec((k, 1, kc, n, 1),
                         lambda b, kk: (_i0, b, kk, _i0, _i0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1, kc, m),
                         lambda b, kk: (_i0, b, kk, _i0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, 1, n, m), lambda b, kk: (_i0, b, _i0, _i0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, B, n, m), dtype),
        scratch_shapes=[
            pltpu.VMEM((k, n, m), dtype),
        ],
        interpret=interpret,
    )(a5, b_limbs)


def xf_matmul_pallas(a: XF, b: XF, interpret: bool = False) -> XF:
    """Fused k-limb matmul: (..., n, K) x (..., K, m) -> (..., n, m).

    Any matching limb count k >= 2 (the dd case keeps its tuned kernel;
    k >= 3 runs the _XOps cascade kernel whose limb count is a static
    kernel parameter — XLA sees one custom-call however large k is, which
    is what keeps high-k TPU compiles tractable).  Leading batch dims of
    a and b must broadcast; both are materialized to the broadcast batch.
    """
    assert a.k == b.k and a.k >= 2, (a.k, b.k)
    assert a.ndim >= 2 and b.ndim >= 2, (a.shape, b.shape)
    k = a.k
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    n, K = a.shape[-2:]
    K2, m = b.shape[-2:]
    assert K == K2, (a.shape, b.shape)
    al = jnp.broadcast_to(a.limbs, (k,) + batch + (n, K))
    bl = jnp.broadcast_to(b.limbs, (k,) + batch + (K, m))
    B = 1
    for d in batch:
        B *= d
    fn = _matmul_batched if k == 2 else _matmul_batched_k
    out = fn(
        al.reshape(k, B, n, K), bl.reshape(k, B, K, m), interpret=interpret
    )
    return XF(out.reshape((k,) + batch + (n, m)))
