"""Extended-precision dense linear algebra on XF matrices.

Replaces the reference solver's Arb matrix-factorization kernel set
(SURVEY.md §2.9; reference call sites: Arblib.spd_inv! MPMP.jl:766,
approx_inv! :781-788, approx_lu! :1436/:1501, approx_solve_tril!/triu!
:1459-1463/:1752-1772, approx_solve_lu_precomp! :1764, cho! :1846,
approx_eig_qr! :1860).

Everything is jit-compatible: loops are `lax.fori_loop` with
dynamic-slice row/column access on the stacked limb array, so a factorization
traces to O(1) HLO and runs with static shapes.  Batched use is via vmap.

Failure reporting follows the reference's degradation-ladder contract
(MPMP.jl:762-801, 1429-1441): factorizations return an `ok` flag instead of
raising; the solver escalates (Cholesky -> LU -> higher precision) on
failure.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from clrs_tpu.ops.xfloat import (
    XF,
    xf_abs,
    xf_add,
    xf_div,
    xf_matmul,
    xf_mul,
    xf_sqrt,
    xf_sum,
    xf_where,
)

# Above this order, xf_cholesky dispatches to the blocked panel
# formulation (xf_cholesky_panel): the O(n^2)-per-column trailing update
# runs as matmuls instead of the sequential fori_loop's matvecs — 3.9x
# measured at n=512 dd on 2 CPU cores (logs/panel_chol.log), and the
# formulation GSPMD/shard_map can actually partition (VERDICT r4 item 5).
# 0 disables the dispatch.
_PANEL_MIN_N = int(os.environ.get("CLRS_PANEL_CHOL_MIN_N", "256"))
_PANEL_DEFAULT = int(os.environ.get("CLRS_PANEL_CHOL_PANEL", "32"))


def _dyn_row(a: XF, i) -> XF:
    """a[i, :] with traced i; a is (n, m) -> (m,)."""
    row = jax.lax.dynamic_slice_in_dim(a.limbs, i, 1, axis=1)
    return XF(jnp.squeeze(row, axis=1))


def _set_col(a: XF, j, col: XF) -> XF:
    """a[:, j] = col with traced j."""
    return XF(
        jax.lax.dynamic_update_slice_in_dim(a.limbs, col.limbs[:, :, None], j, axis=2)
    )


def _set_row(a: XF, i, row: XF) -> XF:
    return XF(
        jax.lax.dynamic_update_slice_in_dim(a.limbs, row.limbs[:, None, :], i, axis=1)
    )


def _matvec(a: XF, v: XF) -> XF:
    """(n, m) @ (m,) in expansion arithmetic."""
    prod = xf_mul(a, XF(v.limbs[:, None, :]))
    return xf_sum(prod, axis=-1)


def xf_cholesky(a: XF) -> Tuple[XF, jnp.ndarray]:
    """Lower-triangular L with a = L L^T.  Returns (L, ok).

    ok is False if any pivot is <= 0 (matrix not numerically SPD at this
    precision) — the caller escalates per the reference's ladder
    (MPMP.jl:774-786).

    Large blocks (n >= CLRS_PANEL_CHOL_MIN_N, default 256) dispatch to
    the blocked panel formulation (xf_cholesky_panel) — same guarded
    pivots and ok semantics, matmul-shaped trailing updates; value-level
    equal to the sequential loop at the expansion ulp (different but
    exact-EFT association).  Small blocks keep the sequential fori_loop
    (O(1) HLO, the right shape for the many-small-block regime).
    """
    if _PANEL_MIN_N and a.ndim == 2 and a.shape[0] >= _PANEL_MIN_N:
        return xf_cholesky_panel(a, panel=_PANEL_DEFAULT)
    return xf_cholesky_seq(a)


def xf_cholesky_seq(a: XF) -> Tuple[XF, jnp.ndarray]:
    """Sequential (one column per fori_loop step) Cholesky kernel."""
    n = a.shape[0]
    k = a.k
    dtype = a.dtype
    iota = jnp.arange(n)

    L0 = XF.zeros((n, n), k=k, dtype=dtype)

    def body(j, carry):
        L, ok = carry
        rowj = _dyn_row(L, j)  # (n,): L[j, t], zero for t >= j
        # s = A[:, j] - L @ rowj
        colA = XF(jax.lax.dynamic_slice_in_dim(a.limbs, j, 1, axis=2))
        colA = XF(jnp.squeeze(colA.limbs, axis=2))
        s = xf_add(colA, -_matvec(L, rowj))
        djj_l = jax.lax.dynamic_slice_in_dim(s.limbs, j, 1, axis=1)
        djj = XF(jnp.squeeze(djj_l, axis=1))
        ok = ok & (djj.limbs[0] > 0)
        safe = xf_where(djj.limbs[0] > 0, djj, XF.ones((), k=k, dtype=dtype))
        ljj = xf_sqrt(safe)
        col = xf_div(s, ljj)
        col = xf_where(iota > j, col, XF.zeros((n,), k=k, dtype=dtype))
        col = xf_where(iota == j, ljj.broadcast_to((n,)), col)
        L = _set_col(L, j, col)
        return L, ok

    L, ok = jax.lax.fori_loop(0, n, body, (L0, jnp.bool_(True)))
    return L, ok


def xf_cholesky_panel(a: XF, panel: int = 32, axis: Optional[str] = None,
                      n_dev: int = 1) -> Tuple[XF, jnp.ndarray]:
    """Blocked right-looking Cholesky of a symmetric SPD XF matrix.

    Per panel: (1) factor the (panel x panel) diagonal block with the
    sequential kernel (cheap, redundant on every device); (2) one
    triangular solve W = L_d^-1 A[p0:p0+bp, :] (the full row slab — the
    columns past the panel are the L21^T block by symmetry); (3) the
    O(n^2 * bp) trailing update A -= W_f^T W_f with W_f = W masked to
    trailing columns — THE dominant flops, computed as disjoint row
    bands per device inside shard_map (axis=<mesh axis>, n_dev=mesh
    size) and re-replicated with one tiled all_gather per panel.

    Per-row independence of the band products makes the result BITWISE
    identical at any device count (each output row's contraction tree
    never crosses rows) — asserted in tests.  n that does not divide
    `panel` is padded with an exact identity tail (the tail's trailing
    updates are zero, so the leading (n, n) factor is unchanged); when
    sharding (n_dev > 1) the padded order must divide n_dev.

    Reference analogue: the intra-kernel column chunking of
    compute_S_integrated / the S_j LU over shared-memory threads
    (MPMP.jl:1230-1243, 1433-1442), which cannot leave one process.
    """
    n0 = a.shape[0]
    k, dtype = a.k, a.dtype
    n = -(-n0 // panel) * panel
    if n != n0:
        pad = n - n0
        lim = jnp.pad(a.limbs, ((0, 0), (0, pad), (0, pad)))
        eye_tail = XF.eye(pad, k=k, dtype=dtype)
        lim = lim.at[:, n0:, n0:].set(eye_tail.limbs)
        a = XF(lim)
    assert n % max(n_dev, 1) == 0, (n, n_dev)
    cols = jnp.arange(n)
    A = a
    L = XF.zeros((n, n), k=k, dtype=dtype)
    ok = jnp.bool_(True)
    for p0 in range(0, n, panel):
        Dblk = A[p0:p0 + panel, p0:p0 + panel]
        Ld, okd = xf_cholesky_seq(Dblk)
        ok = ok & okd
        Arow = A[p0:p0 + panel, :]  # (bp, n); A stays symmetric throughout
        W = xf_solve_tril(Ld, Arow)  # (bp, n)
        # column block of L: rows < p0 are stale left columns -> mask
        Lcol = W.T  # (n, bp); rows [p0, p0+bp) = Ld, rows >= p0+bp = L21
        Lcol = xf_where(
            (cols >= p0)[:, None],
            Lcol,
            XF.zeros((n, panel), k=k, dtype=dtype),
        )
        L = XF(
            jax.lax.dynamic_update_slice_in_dim(
                L.limbs, Lcol.limbs, p0, axis=2
            )
        )
        # trailing update A -= W_f^T W_f (only the trailing block moves)
        Wf = xf_where(
            (cols >= p0 + panel)[None, :],
            W,
            XF.zeros((panel, n), k=k, dtype=dtype),
        )
        WfT = Wf.T  # (n, bp)
        if axis is not None and n_dev > 1:
            rows_per = n // n_dev
            idx = jax.lax.axis_index(axis)
            band = XF(
                jax.lax.dynamic_slice_in_dim(
                    WfT.limbs, idx * rows_per, rows_per, axis=1
                )
            )
            Uband = xf_matmul(band, Wf)  # (rows_per, n)
            U = XF(
                jax.lax.all_gather(Uband.limbs, axis, axis=1, tiled=True)
            )
        else:
            U = xf_matmul(WfT, Wf)
        A = xf_add(A, XF(-U.limbs))
    if n != n0:
        L = XF(L.limbs[:, :n0, :n0])
    return L, ok


def xf_solve_tril(l: XF, b: XF, unit_diag: bool = False) -> XF:
    """Solve L x = b with L lower triangular; b is (n, m).

    Large systems dispatch to the blocked panel formulation (matmul-
    shaped updates, same threshold as xf_cholesky); small ones keep the
    sequential fori_loop."""
    if _PANEL_MIN_N and l.ndim == 2 and l.shape[0] >= _PANEL_MIN_N:
        return xf_solve_tril_panel(l, b, unit_diag=unit_diag,
                                   panel=_PANEL_DEFAULT)
    return xf_solve_tril_seq(l, b, unit_diag=unit_diag)


def xf_solve_tril_seq(l: XF, b: XF, unit_diag: bool = False) -> XF:
    n = l.shape[0]
    k = l.k
    dtype = l.dtype
    x0 = XF.zeros(b.shape, k=k, dtype=dtype)

    def body(i, x):
        rowl = _dyn_row(l, i)  # (n,)
        rowb = _dyn_row(b, i)  # (m,)
        # acc = rowl @ x  (entries of x with row >= i are still zero)
        prod = xf_mul(XF(rowl.limbs[:, :, None]), x)
        acc = xf_sum(prod, axis=0)
        num = xf_add(rowb, -acc)
        if not unit_diag:
            dii_l = jax.lax.dynamic_slice_in_dim(rowl.limbs, i, 1, axis=1)
            dii = XF(jnp.squeeze(dii_l, axis=1))
            num = xf_div(num, dii)
        return _set_row(x, i, num)

    return jax.lax.fori_loop(0, n, body, x0)


def xf_solve_tril_panel(l: XF, b: XF, unit_diag: bool = False,
                        panel: int = 32) -> XF:
    """Blocked forward substitution: per panel, one (bp, p0) x (p0, m)
    matmul folds in the already-solved rows, then the (bp, bp) diagonal
    block solves sequentially.  The matmuls are the O(n^2 m) flops and
    are XLA/GSPMD-partitionable (the fori_loop form is not)."""
    squeeze = b.ndim == 1
    if squeeze:
        b = XF(b.limbs[:, :, None])
    n = l.shape[0]
    m = b.shape[1]
    k, dtype = l.k, l.dtype
    x = XF.zeros((n, m), k=k, dtype=dtype)
    for p0 in range(0, n, panel):
        bp = min(panel, n - p0)
        rhs = b[p0:p0 + bp, :]
        if p0:
            acc = xf_matmul(l[p0:p0 + bp, :p0], x[:p0, :])
            rhs = xf_add(rhs, XF(-acc.limbs))
        xp = xf_solve_tril_seq(l[p0:p0 + bp, p0:p0 + bp], rhs,
                               unit_diag=unit_diag)
        x = XF(jax.lax.dynamic_update_slice_in_dim(
            x.limbs, xp.limbs, p0, axis=1))
    return XF(jnp.squeeze(x.limbs, axis=2)) if squeeze else x


def xf_solve_triu(u: XF, b: XF, unit_diag: bool = False) -> XF:
    """Solve U x = b with U upper triangular; b is (n, m).

    Large systems dispatch to the blocked panel formulation, like
    xf_solve_tril."""
    if _PANEL_MIN_N and u.ndim == 2 and u.shape[0] >= _PANEL_MIN_N:
        return xf_solve_triu_panel(u, b, unit_diag=unit_diag,
                                   panel=_PANEL_DEFAULT)
    return xf_solve_triu_seq(u, b, unit_diag=unit_diag)


def xf_solve_triu_seq(u: XF, b: XF, unit_diag: bool = False) -> XF:
    n = u.shape[0]
    k = u.k
    dtype = u.dtype
    x0 = XF.zeros(b.shape, k=k, dtype=dtype)

    def body(step, x):
        i = n - 1 - step
        rowu = _dyn_row(u, i)
        rowb = _dyn_row(b, i)
        prod = xf_mul(XF(rowu.limbs[:, :, None]), x)
        acc = xf_sum(prod, axis=0)
        num = xf_add(rowb, -acc)
        if not unit_diag:
            dii_l = jax.lax.dynamic_slice_in_dim(rowu.limbs, i, 1, axis=1)
            dii = XF(jnp.squeeze(dii_l, axis=1))
            num = xf_div(num, dii)
        return _set_row(x, i, num)

    return jax.lax.fori_loop(0, n, body, x0)


def xf_solve_triu_panel(u: XF, b: XF, unit_diag: bool = False,
                        panel: int = 32) -> XF:
    """Blocked back substitution (bottom-up panels; see
    xf_solve_tril_panel)."""
    squeeze = b.ndim == 1
    if squeeze:
        b = XF(b.limbs[:, :, None])
    n = u.shape[0]
    m = b.shape[1]
    k, dtype = u.k, u.dtype
    x = XF.zeros((n, m), k=k, dtype=dtype)
    starts = list(range(0, n, panel))
    for p0 in reversed(starts):
        bp = min(panel, n - p0)
        p1 = p0 + bp
        rhs = b[p0:p1, :]
        if p1 < n:
            acc = xf_matmul(u[p0:p1, p1:], x[p1:, :])
            rhs = xf_add(rhs, XF(-acc.limbs))
        xp = xf_solve_triu_seq(u[p0:p1, p0:p1], rhs, unit_diag=unit_diag)
        x = XF(jax.lax.dynamic_update_slice_in_dim(
            x.limbs, xp.limbs, p0, axis=1))
    return XF(jnp.squeeze(x.limbs, axis=2)) if squeeze else x


def xf_lu(a: XF) -> Tuple[XF, jnp.ndarray, jnp.ndarray]:
    """LU with partial pivoting: returns (LU packed, perm, ok).

    perm is the row permutation applied to a (a[perm] = L @ U).
    Replaces Arblib.approx_lu! (MPMP.jl:1436, 1501).
    """
    n = a.shape[0]
    k = a.k
    dtype = a.dtype
    iota = jnp.arange(n)

    def body(kk, carry):
        lu, perm, ok = carry
        col = XF(jnp.squeeze(jax.lax.dynamic_slice_in_dim(lu.limbs, kk, 1, axis=2), 2))
        mag = jnp.abs(col.limbs[0])
        mag = jnp.where(iota >= kk, mag, -jnp.inf)
        p = jnp.argmax(mag)
        ok = ok & (mag[p] > 0)
        # swap rows kk <-> p
        idx = iota.at[kk].set(p).at[p].set(kk)
        lu = XF(jnp.take(lu.limbs, idx, axis=1))
        perm = jnp.take(perm, idx, axis=0)
        # eliminate below the pivot
        rowk = _dyn_row(lu, kk)  # (n,)
        pivot_l = jax.lax.dynamic_slice_in_dim(rowk.limbs, kk, 1, axis=1)
        pivot = XF(jnp.squeeze(pivot_l, axis=1))
        safe_p = xf_where(
            xf_abs(pivot).limbs[0] > 0, pivot, XF.ones((), k=k, dtype=dtype)
        )
        colk = XF(jnp.squeeze(jax.lax.dynamic_slice_in_dim(lu.limbs, kk, 1, axis=2), 2))
        mults = xf_div(colk, safe_p)
        mults = xf_where(iota > kk, mults, XF.zeros((n,), k=k, dtype=dtype))
        # lu[i, j] -= mults[i] * rowk[j] for j > kk
        upd = xf_mul(XF(mults.limbs[:, :, None]), XF(rowk.limbs[:, None, :]))
        colmask = (iota > kk)[None, :]
        upd = xf_where(colmask, upd, XF.zeros((n, n), k=k, dtype=dtype))
        lu = xf_add(lu, -upd)
        # store multipliers in column kk below the diagonal
        newcol = xf_where(iota > kk, mults, colk)
        lu = _set_col(lu, kk, newcol)
        return lu, perm, ok

    lu, perm, ok = jax.lax.fori_loop(0, n, body, (a, iota, jnp.bool_(True)))
    return lu, perm, ok


def xf_lu_solve(lu: XF, perm: jnp.ndarray, b: XF) -> XF:
    """Solve A x = b from packed LU factors (approx_solve_lu_precomp!,
    MPMP.jl:1764)."""
    pb = XF(jnp.take(b.limbs, perm, axis=1))
    y = xf_solve_tril(lu, pb, unit_diag=True)
    return xf_solve_triu(lu, y, unit_diag=False)


def xf_spd_inverse(a: XF) -> Tuple[XF, jnp.ndarray]:
    """SPD inverse via Cholesky (Arblib.spd_inv!, MPMP.jl:766)."""
    n = a.shape[0]
    L, ok = xf_cholesky(a)
    eye = XF.eye(n, k=a.k, dtype=a.dtype)
    w = xf_solve_tril(L, eye)
    inv = xf_solve_triu(XF(jnp.swapaxes(L.limbs, 1, 2)), w)
    return inv, ok


def xf_inverse_lu(a: XF) -> Tuple[XF, jnp.ndarray]:
    """General inverse via LU (Arblib.approx_inv!, MPMP.jl:781-788)."""
    n = a.shape[0]
    lu, perm, ok = xf_lu(a)
    eye = XF.eye(n, k=a.k, dtype=a.dtype)
    return xf_lu_solve(lu, perm, eye), ok


def xf_sym(a: XF) -> XF:
    """(A + A^T)/2 — the reference symmetrizes Z, dY (MPMP.jl:1719-1727)."""
    at = XF(jnp.swapaxes(a.limbs, -1, -2))
    s = xf_add(a, at)
    return XF(s.limbs * 0.5)


def xf_eigvalsh_approx(a: XF) -> jnp.ndarray:
    """Eigenvalues of a symmetric XF matrix, computed in plain float64.

    Used for the step-length oracle: the reference computes eigenvalues per
    block each iteration (approx_eig_qr!, MPMP.jl:1860) but consumes only
    lambda_min with a gamma=0.7 safety slack (:1893-1897), so ~1e-13
    relative accuracy suffices.  The matrix itself (L^-1 dM L^-T) is formed
    in full precision first.
    """
    return jnp.linalg.eigvalsh(a.to_float64())


def _jacobi_schedule(n: int):
    """Round-robin (circle-method) pairings: (rounds, n//2) index arrays
    top/bot such that every unordered pair (i, j) appears exactly once
    across the n-1 rounds, with the pairs within a round disjoint."""
    import numpy as np

    assert n % 2 == 0
    rounds = n - 1
    top = np.zeros((rounds, n // 2), dtype=np.int32)
    bot = np.zeros((rounds, n // 2), dtype=np.int32)
    others = list(range(1, n))
    for r in range(rounds):
        arr = [0] + others[r:] + others[:r]
        for i in range(n // 2):
            a, b = arr[i], arr[n - 1 - i]
            top[r, i], bot[r, i] = min(a, b), max(a, b)
    return top, bot


def jacobi_min_eig(a: jnp.ndarray, sweeps: int = 6) -> jnp.ndarray:
    """Safe lower bound on lambda_min of a symmetric matrix, native dtype.

    Parallel-order cyclic Jacobi: each round applies n/2 disjoint Givens
    rotations as ONE orthogonal similarity Q^T A Q (two dense matmuls —
    MXU work), n-1 rounds per sweep.  After `sweeps` sweeps the matrix is
    numerically diagonal; the returned value is the Gershgorin lower bound
    min_i (a_ii - sum_{j!=i} |a_ij|) of the rotated matrix, which never
    exceeds the true lambda_min — so a step length computed from it is
    always safe (the reference's gamma slack absorbs the slack,
    MPMP.jl:1893-1897).

    This is the TPU replacement for the reference's per-block complex QR
    eigendecomposition (approx_eig_qr!, MPMP.jl:1860): on TPU there is no
    native eigensolver and f64 is emulated, so the f32-limb solver runs
    this in f32 instead of jnp.linalg.eigvalsh on lifted f64.
    """
    n = a.shape[-1]
    if n == 1:
        return a[..., 0, 0]
    dtype = a.dtype
    npad = n + (n % 2)
    if npad != n:
        # decoupled pad eigenvalue = max diagonal >= true lambda_min, so it
        # can never win the min below
        pad_val = jnp.max(jnp.diagonal(a, axis1=-2, axis2=-1), axis=-1)
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(0, 1), (0, 1)])
        a = a.at[..., n, n].set(pad_val)
    top_np, bot_np = _jacobi_schedule(npad)
    top_all = jnp.asarray(top_np)
    bot_all = jnp.asarray(bot_np)
    rounds = top_all.shape[0]
    eye = jnp.eye(npad, dtype=dtype)

    def round_body(step, A):
        r = step % rounds
        p = top_all[r]
        q = bot_all[r]
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        small = jnp.abs(apq) <= jnp.finfo(dtype).tiny
        safe_apq = jnp.where(small, jnp.asarray(1.0, dtype), apq)
        tau = (aqq - app) / (2.0 * safe_apq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0, jnp.asarray(1.0, dtype), t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c = jnp.where(small, jnp.asarray(1.0, dtype), c)
        s = jnp.where(small, jnp.asarray(0.0, dtype), s)
        Q = eye
        Q = Q.at[p, p].set(c).at[q, q].set(c)
        Q = Q.at[p, q].set(s).at[q, p].set(-s)
        A = jnp.matmul(
            Q.T, jnp.matmul(A, Q, precision=jax.lax.Precision.HIGHEST),
            precision=jax.lax.Precision.HIGHEST,
        )
        return (A + jnp.swapaxes(A, -1, -2)) * 0.5

    a = jax.lax.fori_loop(0, sweeps * rounds, round_body, a)
    diag = jnp.diagonal(a, axis1=-2, axis2=-1)
    radius = jnp.sum(jnp.abs(a), axis=-1) - jnp.abs(diag)
    return jnp.min(diag - radius, axis=-1)


def xf_min_eig_sym(m: XF, dm: XF) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """lambda_min of L^-1 dM L^-T where m = L L^T (step-length oracle).

    Returns (lambda_min, ok).  Mirrors MPMP.jl:1842-1880: Cholesky of
    M, two triangular solves, symmetric eigenvalues, min.  With f32 limbs
    (the TPU numerics) the eigensolve runs as native-dtype parallel Jacobi
    instead of lifting to emulated f64.
    """
    L, ok = xf_cholesky(m)
    w = xf_solve_tril(L, dm)
    wt = XF(jnp.swapaxes(w.limbs, 1, 2))
    lml = xf_solve_tril(L, wt)
    lml_sym = xf_sym(lml)
    if lml_sym.dtype == jnp.float32:
        return jacobi_min_eig(lml_sym.to_float()), ok
    eigs = xf_eigvalsh_approx(lml_sym)
    return jnp.min(eigs), ok
