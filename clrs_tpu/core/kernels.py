"""Batched IPM compute kernels: bilinear pairings, Schur assembly,
constraint traces, weighted constraint sums.

These are the TPU re-derivations of the reference's hot loops:
  - compute_S_integrated (MPMP.jl:1218-1414): the quartic scalar loop over
    (r1,s1,k1)x(r2,s2,k2)x(rnk1,rnk2) becomes elementwise products of the
    pairing tensors with a segment-sum over the padded rank axis.
  - trace_A, generic and fast-path (MPMP.jl:1517-1618)
  - compute_weighted_A! (MPMP.jl:1621-1678)

Index conventions (per cluster j, inner block l):
  delta  = length of each low-rank vector
  T      = n_samples * rmax  (padded vector count), t = k*rmax + rnk
  V      = (delta, T) XF of vectors; H = (T,) XF of weights (0 in padding)
  PSD block Z is (m*delta, m*delta), viewed as (m, delta, m, delta)
  pairing tensor P_Z[r, t1, s, t2] = v_{t1}^T Z[r, s] v_{t2},
    shape (m, T, m, T)
  tuple index within the cluster: idx = pair_index(r, s)*K + k
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp

from clrs_tpu.core.blockinfo import BlockInfo, pair_list
from clrs_tpu.ops.xfloat import (
    XF,
    xf_add,
    xf_matmul,
    xf_mul,
    xf_sum,
)


def _mm(a: XF, b: XF, use_mxu) -> XF:
    """Matmul dispatch: expansion-arithmetic VPU path, the integer-sliced
    MXU path (ops/mxu_matmul.py, use_mxu=True), or the fused Pallas dd
    kernel (ops/pallas_xf.py, use_mxu="pallas") — measured 1.2-1.6x over
    the XLA expansion path on TPU v5e for blocks >= ~24^3; tiny blocks
    stay on the XLA path where grid-step overhead would dominate."""
    if use_mxu == "pallas":
        import jax

        n, K = a.shape[-2:]
        m = b.shape[-1]
        # k >= 3 routes through the generic limb-count-parameterized kernel
        # at a LOWER size threshold: besides the fusion win, every matmul
        # moved into the one custom-call shrinks the HLO the XLA compiler
        # has to chew (the k>=4 compile wall, CLAUDE.md), so small blocks
        # are worth it there too.
        size_ok = n * K * m >= (10000 if a.k == 2 else 2000)
        # No upper limb cap: the generic kernel takes k as a STATIC
        # parameter, and the k~14 scaled-f32 contract runs (the
        # reference's 512-bit regime on-chip, VERDICT r3 item 2) depend
        # on every matmul staying a custom-call — the XLA expansion path
        # at k=14 is the compile wall the kernels exist to avoid.
        if (
            a.k == b.k
            and a.k >= 2
            and size_ok
            and jax.default_backend() == "tpu"
        ):
            from clrs_tpu.ops.pallas_xf import xf_matmul_pallas

            return xf_matmul_pallas(a, b)
        return xf_matmul(a, b)
    if use_mxu is True and a.ndim == 2 and b.ndim == 2:
        from clrs_tpu.ops.mxu_matmul import xf_matmul_mxu

        return xf_matmul_mxu(a, b)
    return xf_matmul(a, b)


def compute_pairings(Z: XF, V: XF, m: int, use_mxu: bool = False) -> XF:
    """P[r, t1, s, t2] = V[:,t1]^T Z[r·δ:(r+1)δ, s·δ:(s+1)δ] V[:,t2].

    Two expansion matmuls — the reference's per-(r,s) slab products
    (MPMP.jl:1272-1318) become one batched contraction.
    Z: (m*delta, m*delta), V: (delta, T) -> (m, T, m, T).
    """
    delta, T = V.shape
    Zb = Z.reshape((m, delta, m, delta))
    # ZV[r, d, s, t2] = sum_e Z[r,d,s,e] V[e,t2]
    Zflat = Zb.reshape((m * delta * m, delta))
    ZV = _mm(Zflat, V, use_mxu).reshape((m, delta, m, T))
    # P[r, t1, s, t2] = sum_d V[d, t1] ZV[r, d, s, t2]
    ZVt = ZV.transpose(1, 0, 2, 3).reshape((delta, m * m * T))
    P = _mm(V.T, ZVt, use_mxu).reshape((T, m, m, T))
    return P.transpose(1, 0, 2, 3)  # (m, T, m, T)


def pairing_diag(P: XF, m: int) -> XF:
    """A_Y[r, s, t] = P[r, t, s, t] — the diagonal pairings kept for the
    fast Tr(A_* Y) path (MPMP.jl:1320-1330)."""
    # limbs: (k, m, T, m, T) -> diagonal over axes (2, 4)
    d = jnp.diagonal(P.limbs, axis1=2, axis2=4)  # (k, m, m, T)
    return XF(d)


def _schur_pallas_ok(PX: XF, use_mxu) -> bool:
    """Route the Schur elementwise core through the fused Pallas kernel
    (ops/pallas_xf.xf_schur_pairs_pallas) when the matmul mode is already
    Pallas on TPU.  Besides the fusion win, this removes the largest
    remaining HLO block from the decomposition phase — the k>=6
    whole-iteration compile wall (BASELINE.md round-3 measurement log)."""
    if use_mxu != "pallas":
        return False
    import jax

    return PX.k >= 2 and jax.default_backend() == "tpu"


def _schur_block_contribution_pallas(
    PX: XF, PY: XF, HH: XF, m: int, K: int, rmax: int,
    interpret: bool = False,
) -> XF:
    """Pallas-fused variant of the entry formula below: gather the 8
    pairing-tensor slices per (pair1, pair2) with static index arrays
    (cheap XLA gathers), run the 4-mul/3-add/weight cascade core as ONE
    custom-call over all block pairs, then do the exact rank segment-sum
    and (pair, K)-tiling rearrangement in XLA."""
    import numpy as np

    from clrs_tpu.ops.pallas_xf import xf_schur_pairs_pallas

    pairs = pair_list(m)
    P = len(pairs)
    T = K * rmax
    # static gather indices over the two m-axes of PX/PY: for block pair
    # ((r1,s1), (r2,s2)), the 4 products need
    #   a_i = PX[ar_i, :, ac_i, :]          (t1, t2)
    #   b_i = PY[br_i, :, bc_i, :]^T        (stored [t2, t1] -> transposed)
    ar = np.empty((P * P, 4), np.int32)
    ac = np.empty((P * P, 4), np.int32)
    br = np.empty((P * P, 4), np.int32)
    bc = np.empty((P * P, 4), np.int32)
    for i1, (r1, s1) in enumerate(pairs):
        for i2, (r2, s2) in enumerate(pairs):
            q = i1 * P + i2
            ar[q] = (s1, r1, s1, r1)
            ac[q] = (r2, r2, s2, s2)
            br[q] = (s2, s2, r2, r2)
            bc[q] = (r1, s1, r1, s1)
    # advanced indexing on axes 1 and 3 (separated by a slice) puts the
    # index dims in front: (P2, 4, k, T, T) -> transpose to (k, P2, 4, T, T)
    A4 = jnp.transpose(PX.limbs[:, ar, :, ac, :], (2, 0, 1, 3, 4))
    B4t = jnp.transpose(PY.limbs[:, br, :, bc, :], (2, 0, 1, 3, 4))
    B4 = jnp.swapaxes(B4t, -1, -2)  # [t2, t1] -> [t1, t2]
    W = xf_schur_pairs_pallas(XF(A4), XF(B4), HH, interpret=interpret)
    # exact rank segment-sum (matches the XLA path's axis order: t2's rank
    # slots first, then t1's), then (pair, K) block layout
    W6 = W.reshape((P, P, K, rmax, K, rmax))
    blk = xf_sum(xf_sum(W6, axis=5), axis=3)  # (P, P, K, K)
    out = blk.transpose(0, 2, 1, 3).reshape((P * K, P * K))
    return out


def schur_block_contribution(
    PX: XF, PY: XF, H: XF, m: int, K: int, rmax: int, use_mxu=False
) -> XF:
    """Contribution of one (j, l) block to the Schur complement S_j.

    Entry formula (re-derived from MPMP.jl:1373-1396): for tuples
    i1=(r1,s1,k1), i2=(r2,s2,k2),

      S[i1, i2] += sum_{rnk1, rnk2} H[t1] H[t2] / 4 * (
          PX[s1,t1,r2,t2]·PY[s2,t2,r1,t1] + PX[r1,t1,r2,t2]·PY[s2,t2,s1,t1]
        + PX[s1,t1,s2,t2]·PY[r2,t2,r1,t1] + PX[r1,t1,s2,t2]·PY[r2,t2,s1,t1])

    For each pair of (r,s)-pairs this is elementwise in (t1, t2) followed by
    a sum over the rank slots within each sample — all batched, no scalar
    loops.  Returns S contribution of shape (npairs*K, npairs*K).
    """
    pairs = pair_list(m)
    T = K * rmax
    HH = xf_mul(XF(H.limbs[:, :, None]), XF(H.limbs[:, None, :]))  # (T, T)
    HH = XF(HH.limbs * 0.25)
    if _schur_pallas_ok(PX, use_mxu):
        return _schur_block_contribution_pallas(PX, PY, HH, m, K, rmax)

    rows: List[XF] = []
    for (r1, s1) in pairs:
        cols: List[XF] = []
        for (r2, s2) in pairs:
            # elementwise over (t1, t2)
            a1 = PX[s1, :, r2, :]
            b1 = PY[s2, :, r1, :].T  # [t2, t1] -> [t1, t2]
            a2 = PX[r1, :, r2, :]
            b2 = PY[s2, :, s1, :].T
            a3 = PX[s1, :, s2, :]
            b3 = PY[r2, :, r1, :].T
            a4 = PX[r1, :, s2, :]
            b4 = PY[r2, :, s1, :].T
            w = xf_add(
                xf_add(xf_mul(a1, b1), xf_mul(a2, b2)),
                xf_add(xf_mul(a3, b3), xf_mul(a4, b4)),
            )
            w = xf_mul(w, HH)  # (T, T)
            # segment-sum the rank slots: (K, rmax, K, rmax) -> (K, K)
            w4 = w.reshape((K, rmax, K, rmax))
            blk = xf_sum(xf_sum(w4, axis=3), axis=1)
            cols.append(blk)
        rows.append(XF(jnp.concatenate([c.limbs for c in cols], axis=2)))
    return XF(jnp.concatenate([r.limbs for r in rows], axis=1))


def trace_A_from_diag(
    A_Y: XF, H: XF, m: int, K: int, rmax: int
) -> XF:
    """Fast path Tr(A_i Y) from precomputed diagonal pairings
    (MPMP.jl:1585-1618).  A_Y: (m, m, T) -> (npairs*K,) in tuple order."""
    pairs = pair_list(m)
    out: List[XF] = []
    for (r, s) in pairs:
        w = xf_mul(A_Y[r, s], H)  # (T,)
        w = w.reshape((K, rmax))
        out.append(xf_sum(w, axis=1))  # (K,)
    return XF(jnp.concatenate([o.limbs for o in out], axis=1))


def trace_A_generic(
    Z: XF, V: XF, H: XF, m: int, K: int, rmax: int, use_mxu: bool = False
) -> XF:
    """Tr(A_i Z) for a generic symmetric block Z (MPMP.jl:1517-1584).

    tr[(r,s,k)] = sum_rnk H[t] * v_t^T Z[r,s] v_t, via the Simmons-Duffin
    hadamard trick: D[t] = sum_d V[d,t] * (Z[r,s] V)[d,t].
    Z: (m*delta, m*delta) -> (npairs*K,).
    """
    delta, T = V.shape
    Zb = Z.reshape((m, delta, m, delta))
    pairs = pair_list(m)
    out: List[XF] = []
    for (r, s) in pairs:
        Zrs = Zb[r, :, s, :]  # (delta, delta)
        M = _mm(Zrs, V, use_mxu)  # (delta, T)
        D = xf_sum(xf_mul(V, M), axis=0)  # (T,)
        w = xf_mul(D, H).reshape((K, rmax))
        out.append(xf_sum(w, axis=1))
    return XF(jnp.concatenate([o.limbs for o in out], axis=1))


def weighted_A_block(
    a_j: XF, V: XF, H: XF, m: int, K: int, rmax: int, use_mxu: bool = False
) -> XF:
    """sum_i a_i A_i restricted to one (j, l) PSD block (MPMP.jl:1621-1678).

    a_j: (npairs*K,) slice of the weight vector for cluster j.
    Result: (m*delta, m*delta), with off-diagonal (r,s) blocks halved
    (the Sym(E_rs) factor) and symmetrized.
    """
    delta, T = V.shape
    pairs = pair_list(m)
    # blocks[r][s]
    zero = XF.zeros((delta, delta), k=V.k, dtype=V.dtype)
    blocks = [[None for _ in range(m)] for _ in range(m)]
    for p, (r, s) in enumerate(pairs):
        a_rs = a_j[p * K : (p + 1) * K]  # (K,)
        # weight per slot t: a[k(t)] * H[t]
        a_t = XF(jnp.repeat(a_rs.limbs, rmax, axis=1))  # (T,)
        w = xf_mul(a_t, H)  # (T,)
        U = xf_mul(V, XF(w.limbs[:, None, :]))  # (delta, T) scaled columns
        W = _mm(U, V.T, use_mxu)  # (delta, delta) = V diag(w) V^T
        if r == s:
            blocks[r][s] = W
        else:
            Wh = XF(W.limbs * 0.5)
            blocks[r][s] = Wh
            blocks[s][r] = Wh.T
    for r in range(m):
        for s in range(m):
            if blocks[r][s] is None:
                blocks[r][s] = zero
    rows = [
        XF(jnp.concatenate([blocks[r][s].limbs for s in range(m)], axis=2))
        for r in range(m)
    ]
    return XF(jnp.concatenate([r.limbs for r in rows], axis=1))
