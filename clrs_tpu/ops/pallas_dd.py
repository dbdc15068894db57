"""Pallas TPU kernels for double-double (2-limb) linear algebra.

The XLA path (ops/linalg.py) factors each block with a per-column
`lax.fori_loop` of dynamic-slice ops — correct, but on TPU every loop step
is a handful of tiny kernel launches, so small-block factorizations are
launch-latency-bound (the dominant per-iteration cost of the reference's
problem class, whose PSD blocks are 1-64 wide).  Here the ENTIRE batched
factorization — Cholesky, forward solve, and the W^T W inverse assembly —
runs as ONE Pallas kernel: each grid program owns one block resident in
VMEM, looping over columns on-core with zero launch overhead.

Replaces the reference's Arblib.spd_inv! (MPMP.jl:766) on the TPU path.

Lowering constraints honored here: no dynamic indexing along the lane
(last) dimension — loop-carried row/column selection uses exact one-hot
sums, and dd reductions are static-slice halving trees.

EFT safety: Mosaic (the Pallas TPU compiler) lowers arithmetic as written —
verified on TPU v5e that TwoSum/TwoProd survive compilation bit-exactly
WITHOUT optimization barriers (which Mosaic cannot lower at all).  In
interpret mode the kernel body is inlined into the surrounding XLA program,
whose algebraic simplifier DOES rewrite (a+b)-a -> b — so interpret-mode
(CPU test) kernels insert `lax.optimization_barrier` exactly like
ops/xfloat.py.  The `_Ops` helper bundles the two variants.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class _Ops:
    """Double-double primitives on (hi, lo) array pairs.

    barrier=True (interpret/CPU): protect EFTs from the XLA simplifier.
    barrier=False (Mosaic/TPU): lower as written, verified safe on hardware.
    """

    def __init__(self, barrier: bool):
        self._b = jax.lax.optimization_barrier if barrier else (lambda x: x)

    def two_sum(self, a, b):
        s = self._b(a + b)
        bb = self._b(s - a)
        e = (a - (s - bb)) + (b - bb)
        return s, e

    def fast_two_sum(self, a, b):
        s = self._b(a + b)
        return s, b - (s - a)

    def split(self, a):
        c = jnp.asarray(4097.0 if a.dtype == jnp.float32 else 134217729.0, a.dtype)
        t = c * a
        u = self._b(t - a)
        hi = t - u
        return hi, a - hi

    def two_prod(self, a, b):
        p = a * b
        ah, al = self.split(a)
        bh, bl = self.split(b)
        e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        return p, e

    def add(self, ah, al, bh, bl):
        """QD ieee_add (matches ops/xfloat._dd_add)."""
        s1, s2 = self.two_sum(ah, bh)
        t1, t2 = self.two_sum(al, bl)
        s2 = s2 + t1
        s1, s2 = self.fast_two_sum(s1, s2)
        s2 = s2 + t2
        return self.fast_two_sum(s1, s2)

    def mul(self, ah, al, bh, bl):
        p, e = self.two_prod(ah, bh)
        e = e + (ah * bl + al * bh)
        return self.fast_two_sum(p, e)

    def div(self, ah, al, bh, bl):
        """Reciprocal Newton + one refinement (matches xf_div at k=2)."""
        safe = jnp.where(bh != 0, bh, jnp.ones_like(bh))
        xh = 1.0 / safe
        xl = jnp.zeros_like(xh)
        for _ in range(2):
            # x <- x + x*(1 - b*x)
            th, tl = self.mul(bh, bl, xh, xl)
            eh, el = self.add(jnp.ones_like(th), jnp.zeros_like(tl), -th, -tl)
            ch, cl = self.mul(xh, xl, eh, el)
            xh, xl = self.add(xh, xl, ch, cl)
        qh, ql = self.mul(ah, al, xh, xl)
        # refinement: q += (a - b*q) * x
        th, tl = self.mul(bh, bl, qh, ql)
        rh, rl = self.add(ah, al, -th, -tl)
        ch, cl = self.mul(rh, rl, xh, xl)
        return self.add(qh, ql, ch, cl)

    def sqrt(self, ah, al):
        """rsqrt Newton (matches xf_sqrt at k=2); a >= 0, 0 allowed."""
        pos = ah > 0
        safe_h = jnp.where(pos, ah, jnp.ones_like(ah))
        safe_l = jnp.where(pos, al, jnp.zeros_like(al))
        xh = jax.lax.rsqrt(safe_h)
        xl = jnp.zeros_like(xh)
        half = jnp.asarray(0.5, ah.dtype)
        for _ in range(2):
            # x <- x + 0.5*x*(1 - a*x*x)
            x2h, x2l = self.mul(xh, xl, xh, xl)
            th, tl = self.mul(safe_h, safe_l, x2h, x2l)
            eh, el = self.add(jnp.ones_like(th), jnp.zeros_like(tl), -th, -tl)
            ch, cl = self.mul(xh, xl, eh, el)
            xh, xl = self.add(xh, xl, half * ch, half * cl)
        sh, sl = self.mul(safe_h, safe_l, xh, xl)
        # refinement: s += (a - s*s) * x / 2
        s2h, s2l = self.mul(sh, sl, sh, sl)
        eh, el = self.add(safe_h, safe_l, -s2h, -s2l)
        ch, cl = self.mul(eh, el, xh, xl)
        sh, sl = self.add(sh, sl, half * ch, half * cl)
        zero = jnp.zeros_like(sh)
        return jnp.where(pos, sh, zero), jnp.where(pos, sl, zero)

    def sum_axis(self, ph, plo, axis: int):
        """dd sum along an axis: zero-padded static halving tree (exact dd
        adds; no dynamic indexing)."""
        m = ph.shape[axis]
        np2 = 1
        while np2 < m:
            np2 *= 2
        if np2 != m:
            pad = [(0, 0)] * ph.ndim
            pad[axis] = (0, np2 - m)
            ph = jnp.pad(ph, pad)
            plo = jnp.pad(plo, pad)
        while np2 > 1:
            half = np2 // 2
            ah = jax.lax.slice_in_dim(ph, 0, half, axis=axis)
            al = jax.lax.slice_in_dim(plo, 0, half, axis=axis)
            bh = jax.lax.slice_in_dim(ph, half, np2, axis=axis)
            bl = jax.lax.slice_in_dim(plo, half, np2, axis=axis)
            ph, plo = self.add(ah, al, bh, bl)
            np2 = half
        return jnp.squeeze(ph, axis=axis), jnp.squeeze(plo, axis=axis)


def _spd_inverse_kernel(a_ref, out_ref, okf_ref, lh_ref, ll_ref, wh_ref, wl_ref,
                        *, n: int, ops: _Ops):
    """One block: A = L L^T (Cholesky), W = L^-1 (forward solve),
    A^-1 = W^T W.  All dd, all VMEM-resident; loop-carried row/column
    selection via exact one-hot sums (no lane-dim dynamic indexing)."""
    dd = ops
    dtype = a_ref.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)
    # NOTE: one-hot masks use jnp.where(pred, 1.0, 0.0) rather than
    # pred.astype(float): Mosaic's convert_element_type lowering rule
    # recurses infinitely on bool->float converts (stack overflow at
    # lowering time on real TPU; interpret mode unaffected).

    lh_ref[:] = jnp.zeros((n, n), dtype)
    ll_ref[:] = jnp.zeros((n, n), dtype)
    # Pivot-positivity flags: one f32 lane per column, reduced to a bool on
    # the XLA side.  (Mosaic cannot lower rank-1 -> scalar vector reductions
    # — "Not implemented: Offset change" — so the kernel never materializes
    # a scalar.)
    okf_ref[0, 0, :] = jnp.ones((n,), dtype)

    Ah = a_ref[0, 0, :, :]
    Al = a_ref[0, 1, :, :]

    def chol_col(j, _):
        Lh = lh_ref[:]
        Ll = ll_ref[:]
        rowsel = jnp.where(rows == j, one, zero)    # one-hot row j
        colsel = jnp.where(cols == j, one, zero)    # one-hot col j
        rowjh = jnp.sum(Lh * rowsel, axis=0)        # L[j, :], exact
        rowjl = jnp.sum(Ll * rowsel, axis=0)
        Ajh = jnp.sum(Ah * colsel, axis=1)          # A[:, j], exact
        Ajl = jnp.sum(Al * colsel, axis=1)
        # s = A[:, j] - L @ rowj  (dd matvec via halving tree over lanes)
        ph, plo = dd.mul(Lh, Ll, rowjh[None, :], rowjl[None, :])  # (n, n)
        acc_h, acc_l = dd.sum_axis(ph, plo, axis=1)
        sh, sl = dd.add(Ajh, Ajl, -acc_h, -acc_l)
        onej = jnp.where(rows[:, 0] == j, one, zero)  # (n,) one-hot vector
        # pivot s[j] as a broadcast (n,) vector: 2-D lane reduction of the
        # masked row (rank-1 -> scalar reductions don't lower in Mosaic)
        djj_h = jnp.sum(jnp.broadcast_to(sh[None, :] * onej[None, :], (n, n)),
                        axis=1)
        djj_l = jnp.sum(jnp.broadcast_to(sl[None, :] * onej[None, :], (n, n)),
                        axis=1)
        flag = jnp.where(djj_h > 0, one, zero)      # (n,), all entries equal
        okf_ref[0, 0, :] = jnp.where(cols[0, :] == j, flag, okf_ref[0, 0, :])
        safe_h = jnp.where(djj_h > 0, djj_h, one)
        safe_l = jnp.where(djj_h > 0, djj_l, zero)
        ljj_h, ljj_l = dd.sqrt(safe_h, safe_l)
        ch, cl = dd.div(sh, sl, ljj_h, ljj_l)
        below = rows[:, 0] > j
        at = rows[:, 0] == j
        ch = jnp.where(at, ljj_h, jnp.where(below, ch, 0.0))
        cl = jnp.where(at, ljj_l, jnp.where(below, cl, 0.0))
        # write column j (mask-merge, no dynamic store)
        lh_ref[:] = jnp.where(cols == j, ch[:, None], Lh)
        ll_ref[:] = jnp.where(cols == j, cl[:, None], Ll)
        return jnp.int32(0)  # i64 carries don't legalize in Mosaic

    # int32 loop bounds: with jax_enable_x64 a python-int bound makes the
    # counter int64, and `rows == j` then emits an int32->int64 convert
    # that Mosaic's _convert_helper recurses on infinitely (64-bit ints
    # are unsupported in TPU kernels).
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), chol_col, jnp.int32(0),
                      unroll=False)

    # W = L^-1 by forward substitution, one row at a time
    wh_ref[:] = jnp.zeros((n, n), dtype)
    wl_ref[:] = jnp.zeros((n, n), dtype)

    def solve_row(i, _):
        Lh = lh_ref[:]
        Ll = ll_ref[:]
        Wh = wh_ref[:]
        Wl = wl_ref[:]
        rowsel = jnp.where(rows == i, one, zero)
        rowlh = jnp.sum(Lh * rowsel, axis=0)        # L[i, :]
        rowll = jnp.sum(Ll * rowsel, axis=0)
        # acc[c] = sum_t L[i,t] W[t,c]  (W rows >= i still zero)
        ph, plo = dd.mul(rowlh[:, None], rowll[:, None], Wh, Wl)
        acc_h, acc_l = dd.sum_axis(ph, plo, axis=0)
        onei = jnp.where(rows[:, 0] == i, one, zero)
        ei = onei                                    # row i of I
        nh, nl = dd.add(ei, jnp.zeros_like(ei), -acc_h, -acc_l)
        # L[i, i] as a broadcast (n,) vector (same Mosaic constraint)
        dh = jnp.sum(jnp.broadcast_to(rowlh[None, :] * onei[None, :], (n, n)),
                     axis=1)
        dl = jnp.sum(jnp.broadcast_to(rowll[None, :] * onei[None, :], (n, n)),
                     axis=1)
        qh, ql = dd.div(nh, nl, dh, dl)
        wh_ref[:] = jnp.where(rows == i, qh[None, :], Wh)
        wl_ref[:] = jnp.where(rows == i, ql[None, :], Wl)
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), solve_row, jnp.int32(0),
                      unroll=False)

    # inv = W^T W  (dd rank-1 accumulation over rows of W)
    #
    # The accumulator is ONE stacked (2, n, n) array, not a (hi, lo) tuple:
    # XLA:CPU at --xla_backend_optimization_level>=1 applies value-changing
    # codegen to fori_loop bodies whose carry is a tuple of separate arrays,
    # destroying the error-free transforms (lo limb degrades to ~1e-16);
    # with a single stacked carry the loop compiles exactly.  (Found
    # empirically; this is also why the XF stacked-limb layout used
    # everywhere else in the solver is immune.)  Matters in interpret mode
    # (CPU tests) only — Mosaic lowers the TPU path as written.
    def wtw_body(t, acc):
        rowsel = jnp.where(rows == t, one, zero)
        rh = jnp.sum(wh_ref[:] * rowsel, axis=0)
        rl = jnp.sum(wl_ref[:] * rowsel, axis=0)
        ph, plo = dd.mul(rh[:, None], rl[:, None], rh[None, :], rl[None, :])
        oh, ol = dd.add(acc[0], acc[1], ph, plo)
        return jnp.stack([oh, ol])

    inv = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n), wtw_body, jnp.zeros((2, n, n), dtype),
        unroll=False,
    )
    out_ref[0, 0, :, :] = inv[0]
    out_ref[0, 1, :, :] = inv[1]


import numpy as _np
_i0 = _np.int32(0)


def dd_spd_inverse_pallas(limbs: jnp.ndarray, interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched dd SPD inverse: limbs (B, 2, n, n) -> (inv (B, 2, n, n),
    ok (B,) bool).  One grid program per block; everything VMEM-resident.
    """
    B, two, n, _ = limbs.shape
    assert two == 2
    dtype = limbs.dtype
    ops = _Ops(barrier=interpret)
    kernel = functools.partial(_spd_inverse_kernel, n=n, ops=ops)
    inv, okf = pl.pallas_call(
        kernel,
        grid=(B,),
        # index maps return int32 zeros: python-int components become i64
        # under jax_enable_x64, and Mosaic cannot legalize an i64-returning
        # index-map function
        in_specs=[
            pl.BlockSpec((1, 2, n, n), lambda b: (b, _i0, _i0, _i0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 2, n, n), lambda b: (b, _i0, _i0, _i0),
                         memory_space=pltpu.VMEM),
            # per-column pivot flags (f32 lanes); scalar/SMEM outputs hit
            # Mosaic lowering limits, so the bool reduction happens in XLA
            pl.BlockSpec((1, 1, n), lambda b: (b, _i0, _i0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 2, n, n), dtype),
            jax.ShapeDtypeStruct((B, 1, n), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n), dtype),  # L hi
            pltpu.VMEM((n, n), dtype),  # L lo
            pltpu.VMEM((n, n), dtype),  # W hi
            pltpu.VMEM((n, n), dtype),  # W lo
        ],
        interpret=interpret,
    )(limbs)
    return inv, jnp.all(okf > 0.5, axis=(1, 2))


def xf_spd_inverse_pallas_batched(x_limbs: jnp.ndarray, interpret: bool = False):
    """Adapter for the solver's stacked-XF layout: limbs (2, B, n, n)."""
    inv, ok = dd_spd_inverse_pallas(
        jnp.swapaxes(x_limbs, 0, 1), interpret=interpret
    )
    return jnp.swapaxes(inv, 0, 1), ok


# ---------------------------------------------------------------------------
# Batch-wide variant: ALL blocks in one grid step, batch on the LANE axis
# ---------------------------------------------------------------------------


def _spd_inverse_wide_kernel(a_ref, out_ref, okf_ref, lh_ref, ll_ref,
                             wh_ref, wl_ref, *, n: int, ops: _Ops):
    """All blocks of one batch chunk simultaneously, layout (n, n, B):
    the batch rides the 128-lane axis, so the column recurrences of the
    factorization vectorize across blocks on the VPU instead of
    serializing one (n, n) tile per grid step (the per-block kernel
    above wastes ~all lanes for the reference's small blocks, n<=64).
    Same dd sequences, same one-hot/mask lowering rules."""
    dd = ops
    dtype = a_ref.dtype
    B = a_ref.shape[-1]
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)

    lh_ref[:] = jnp.zeros((n, n, B), dtype)
    ll_ref[:] = jnp.zeros((n, n, B), dtype)
    okf_ref[:] = jnp.ones((n, B), dtype)

    Ah = a_ref[0, :, :, :]
    Al = a_ref[1, :, :, :]

    def chol_col(j, _):
        Lh = lh_ref[:]
        Ll = ll_ref[:]
        rowsel = jnp.where(rows2 == j, one, zero)      # (n, n, 1)
        colsel = jnp.where(cols2 == j, one, zero)
        rowjh = jnp.sum(Lh * rowsel, axis=0)           # L[j, :, :] (n, B)
        rowjl = jnp.sum(Ll * rowsel, axis=0)
        Ajh = jnp.sum(Ah * colsel, axis=1)             # A[:, j, :] (n, B)
        Ajl = jnp.sum(Al * colsel, axis=1)
        ph, plo = dd.mul(Lh, Ll, rowjh[None, :, :], rowjl[None, :, :])
        acc_h, acc_l = dd.sum_axis(ph, plo, axis=1)    # (n, B)
        sh, sl = dd.add(Ajh, Ajl, -acc_h, -acc_l)
        onej = jnp.where(rows1 == j, one, zero)        # (n, 1)
        # pivot s[j] per block: exact (single nonzero summand per lane)
        djj_h = jnp.sum(sh * onej, axis=0, keepdims=True)   # (1, B)
        djj_l = jnp.sum(sl * onej, axis=0, keepdims=True)
        flag = jnp.where(djj_h > 0, one, zero)         # (1, B)
        okf_ref[:] = jnp.where(rows1 == j, flag, okf_ref[:])
        safe_h = jnp.where(djj_h > 0, djj_h, one)
        safe_l = jnp.where(djj_h > 0, djj_l, zero)
        ljj_h, ljj_l = dd.sqrt(safe_h, safe_l)         # (1, B)
        ch, cl = dd.div(sh, sl, jnp.broadcast_to(ljj_h, sh.shape),
                        jnp.broadcast_to(ljj_l, sl.shape))
        below = rows1 > j                              # (n, 1)
        at = rows1 == j
        ch = jnp.where(at, ljj_h, jnp.where(below, ch, zero))
        cl = jnp.where(at, ljj_l, jnp.where(below, cl, zero))
        lh_ref[:] = jnp.where(cols2 == j, ch[:, None, :], Lh)
        ll_ref[:] = jnp.where(cols2 == j, cl[:, None, :], Ll)
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), chol_col, jnp.int32(0),
                      unroll=False)

    wh_ref[:] = jnp.zeros((n, n, B), dtype)
    wl_ref[:] = jnp.zeros((n, n, B), dtype)

    def solve_row(i, _):
        Lh = lh_ref[:]
        Ll = ll_ref[:]
        Wh = wh_ref[:]
        Wl = wl_ref[:]
        rowsel = jnp.where(rows2 == i, one, zero)
        rowlh = jnp.sum(Lh * rowsel, axis=0)           # L[i, :, :] (n, B)
        rowll = jnp.sum(Ll * rowsel, axis=0)
        ph, plo = dd.mul(rowlh[:, None, :], rowll[:, None, :], Wh, Wl)
        acc_h, acc_l = dd.sum_axis(ph, plo, axis=0)    # (n, B)
        onei = jnp.where(rows1 == i, one, zero)        # (n, 1)
        ei = jnp.broadcast_to(onei, (n, B))
        nh, nl = dd.add(ei, jnp.zeros_like(ei), -acc_h, -acc_l)
        dh = jnp.sum(rowlh * onei, axis=0, keepdims=True)   # (1, B)
        dl = jnp.sum(rowll * onei, axis=0, keepdims=True)
        qh, ql = dd.div(nh, nl, jnp.broadcast_to(dh, nh.shape),
                        jnp.broadcast_to(dl, nl.shape))
        wh_ref[:] = jnp.where(rows2 == i, qh[None, :, :], Wh)
        wl_ref[:] = jnp.where(rows2 == i, ql[None, :, :], Wl)
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), solve_row, jnp.int32(0),
                      unroll=False)

    # inv = W^T W; single stacked carry (see wtw_body note above)
    def wtw_body(t, acc):
        rowsel = jnp.where(rows2 == t, one, zero)
        rh = jnp.sum(wh_ref[:] * rowsel, axis=0)       # (n, B)
        rl = jnp.sum(wl_ref[:] * rowsel, axis=0)
        ph, plo = dd.mul(rh[:, None, :], rl[:, None, :],
                         rh[None, :, :], rl[None, :, :])
        oh, ol = dd.add(acc[0], acc[1], ph, plo)
        return jnp.stack([oh, ol])

    inv = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(n), wtw_body, jnp.zeros((2, n, n, B), dtype),
        unroll=False,
    )
    out_ref[0, :, :, :] = inv[0]
    out_ref[1, :, :, :] = inv[1]


def dd_spd_inverse_pallas_wide(
    limbs: jnp.ndarray, interpret: bool = False, max_chunk_elems: int = 1 << 20
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched dd SPD inverse, batch-on-lanes layout: limbs (B, 2, n, n)
    -> (inv (B, 2, n, n), ok (B,) bool).

    The batch is moved to the last (lane) axis and processed in chunks
    sized to fit VMEM (~10 arrays of n*n*Bc floats).  Blocks within a
    chunk factor in lockstep across the lanes."""
    B, two, n, _ = limbs.shape
    assert two == 2
    dtype = limbs.dtype
    ops = _Ops(barrier=interpret)

    # chunk the batch so scratch+io stay well under VMEM
    Bc = max(1, min(B, max_chunk_elems // max(n * n, 1)))
    nchunks = -(-B // Bc)
    Bpad = nchunks * Bc
    x = jnp.transpose(limbs, (1, 2, 3, 0))  # (2, n, n, B)
    if Bpad != B:
        # pad with identity blocks (valid Cholesky; flags sliced off)
        eye = jnp.broadcast_to(
            jnp.eye(n, dtype=dtype)[None, :, :, None], (1, n, n, Bpad - B)
        )
        pad = jnp.concatenate([eye, jnp.zeros_like(eye)], axis=0)
        x = jnp.concatenate([x, pad], axis=-1)

    kernel = functools.partial(_spd_inverse_wide_kernel, n=n, ops=ops)
    inv, okf = pl.pallas_call(
        kernel,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((2, n, n, Bc), lambda c: (_i0, _i0, _i0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, n, n, Bc), lambda c: (_i0, _i0, _i0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, Bc), lambda c: (_i0, c),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, n, n, Bpad), dtype),
            jax.ShapeDtypeStruct((n, Bpad), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, Bc), dtype),  # L hi
            pltpu.VMEM((n, n, Bc), dtype),  # L lo
            pltpu.VMEM((n, n, Bc), dtype),  # W hi
            pltpu.VMEM((n, n, Bc), dtype),  # W lo
        ],
        interpret=interpret,
    )(x)
    inv = jnp.transpose(inv[..., :B], (3, 0, 1, 2))
    return inv, jnp.all(okf[:, :B] > 0.5, axis=0)


def xf_spd_inverse_pallas_wide(x_limbs: jnp.ndarray, interpret: bool = False):
    """Adapter for the solver's stacked-XF layout: limbs (2, B, n, n)."""
    inv, ok = dd_spd_inverse_pallas_wide(
        jnp.swapaxes(x_limbs, 0, 1), interpret=interpret
    )
    return jnp.swapaxes(inv, 0, 1), ok
