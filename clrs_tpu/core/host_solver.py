"""High-precision host IPM: the 512-bit-equivalent solve path.

Same algorithm as core/solver.py (the reference's solverank1sdp,
MPMP.jl:595-1025), executed on the host through the native k-limb kernels
(core/hostxf.py / native/xfkern.cpp) instead of XLA.  Purpose: the
reference's DEFAULT operating regime is 512-bit arithmetic
(MPMP.jl:17, examples/SpherePacking.jl:29-31) with the simultaneous
contract gap < 1e-15 AND errors < 1e-30 (MPMP.jl:607-609); that needs
k ~ 10 f64 limbs, where XLA compile cost is prohibitive (>114 GB compiler
RSS unrolled; pathological runtime loop-ified).  This path has no
compiler in the loop: problem sizes of the reference's applications are
tiny (dim_S <= ~10^2), so a k=10 iteration takes seconds, not the mpmath
oracle's minute.

All math mirrors core/solver.py phase for phase (which itself re-derives
MPMP.jl; file:line citations there).  Trajectories are validated against
the XLA solver at k<=5 in tests/test_host_solver.py.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from clrs_tpu.core.blockinfo import BlockInfo, pair_list
from clrs_tpu.core.hostxf import (
    HXF,
    hxf_cholesky,
    hxf_dot,
    hxf_from_xf,
    hxf_inverse_lu,
    hxf_lu,
    hxf_lu_solve,
    hxf_matmul,
    hxf_min_eig_sym,
    hxf_solve_tril,
    hxf_spd_inverse,
    hxf_sum,
    hxf_sym,
    hxf_syrk,
)


# ---------------------------------------------------------------------------
# Host problem container
# ---------------------------------------------------------------------------


class HostProblem:
    """Packed problem data as HXF arrays (host mirror of SDPProblem)."""

    def __init__(self, problem=None) -> None:
        """Convert a packed SDPProblem (core/problem.py) to host arrays.
        (Prefer from_pack_data for the all-host path — it never touches
        jax, so no device backend is initialized.)"""
        if problem is None:
            return
        info: BlockInfo = problem.info
        self.info = info
        self.k = problem.b.k
        self.Vs = [
            [hxf_from_xf(problem.clusters[j].Vs[l]) for l in range(info.L[j])]
            for j in range(info.J)
        ]
        self.Hs = [
            [hxf_from_xf(problem.clusters[j].Hs[l]) for l in range(info.L[j])]
            for j in range(info.J)
        ]
        self.B = [hxf_from_xf(problem.clusters[j].B) for j in range(info.J)]
        self.c = [hxf_from_xf(problem.clusters[j].c) for j in range(info.J)]
        self.b = hxf_from_xf(problem.b)
        self.b0 = hxf_from_xf(problem.b0)
        self.C_blocks = None
        if problem.C_blocks is not None:
            self.C_blocks = [
                [hxf_from_xf(Cb) for Cb in Cj] for Cj in problem.C_blocks
            ]
        self.x_sigma = (
            hxf_from_xf(problem.x_sigma) if problem.x_sigma is not None else None
        )
        self.y_R_inv = (
            hxf_from_xf(problem.y_R_inv) if problem.y_R_inv is not None else None
        )
        self.y_R = hxf_from_xf(problem.y_R) if problem.y_R is not None else None

    @classmethod
    def from_pack_data(cls, data: Dict[str, Any], k: int) -> "HostProblem":
        """Build from core.problem.prepare_pack_data output (mpmath object
        arrays) at k limbs — the pure-host path, no jax import."""
        self = cls()
        info: BlockInfo = data["info"]
        self.info = info
        self.k = k
        self.Vs = []
        self.Hs = []
        self.B = []
        self.c = []
        for j in range(info.J):
            Vs, Hs, B, c = data["clusters"][j]
            self.Vs.append([HXF.from_mp(V, k=k) for V in Vs])
            self.Hs.append([HXF.from_mp(H, k=k) for H in Hs])
            self.B.append(HXF.from_mp(np.asarray(B, dtype=object), k=k))
            self.c.append(
                HXF.from_mp(np.asarray(c, dtype=object).reshape(-1, 1), k=k)
            )
        self.b = HXF.from_mp(data["b"], k=k)
        self.b0 = HXF.from_mp(data["b0"], k=k)
        self.C_blocks = None
        if data["C"] is not None:
            self.C_blocks = [
                [HXF.from_mp(Cb, k=k) for Cb in Cj] for Cj in data["C"]
            ]
        self.x_sigma = HXF.from_mp(data["sigma"], k=k)
        self.y_R_inv = (
            HXF.from_mp(data["y_R_inv"], k=k)
            if data["y_R_inv"] is not None else None
        )
        self.y_R = (
            HXF.from_mp(data["y_R"], k=k) if data["y_R"] is not None else None
        )
        return self


# ---------------------------------------------------------------------------
# Kernels (host mirrors of core/kernels.py; same index conventions)
# ---------------------------------------------------------------------------


def compute_pairings_h(Z: HXF, V: HXF, m: int) -> HXF:
    """P[r, t1, s, t2] = V[:,t1]^T Z[r·δ:(r+1)δ, s·δ:(s+1)δ] V[:,t2]
    (kernels.compute_pairings / MPMP.jl:1272-1318)."""
    delta, T = V.shape
    Zb = Z.reshape((m, delta, m, delta))
    Zflat = Zb.reshape((m * delta * m, delta))
    ZV = hxf_matmul(Zflat, V).reshape((m, delta, m, T))
    ZVt = ZV.transpose(1, 0, 2, 3).reshape((delta, m * m * T))
    P = hxf_matmul(V.T, ZVt).reshape((T, m, m, T))
    return P.transpose(1, 0, 2, 3)  # (m, T, m, T)


def pairing_diag_h(P: HXF, m: int) -> HXF:
    """A_Y[r, s, t] = P[r, t, s, t] (MPMP.jl:1320-1330)."""
    d = np.diagonal(P.limbs, axis1=2, axis2=4)  # (k, m, m, T)
    return HXF(np.ascontiguousarray(d))


def _sum_axis(a: HXF, axis: int) -> HXF:
    """Sum an HXF along one axis by sequential k-limb adds (axis lengths
    here are small: rank slots)."""
    n = a.shape[axis]
    parts = [a[tuple(slice(None) if i != axis else t for i in range(a.ndim))]
             for t in range(n)]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def schur_block_contribution_h(
    PX: HXF, PY: HXF, H: HXF, m: int, K: int, rmax: int
) -> HXF:
    """One (j, l) block's Schur contribution (kernels.py:91-135, entry
    formula MPMP.jl:1373-1396)."""
    pairs = pair_list(m)
    T = K * rmax
    HH = (H.reshape((T, 1)) * H.reshape((1, T))).scale2(0.25)
    k = PX.k
    npairs = len(pairs)
    S = np.zeros((k, npairs * K, npairs * K), dtype=np.float64)
    for pi, (r1, s1) in enumerate(pairs):
        for pj, (r2, s2) in enumerate(pairs):
            a1 = PX[s1, :, r2, :]
            b1 = PY[s2, :, r1, :].T
            a2 = PX[r1, :, r2, :]
            b2 = PY[s2, :, s1, :].T
            a3 = PX[s1, :, s2, :]
            b3 = PY[r2, :, r1, :].T
            a4 = PX[r1, :, s2, :]
            b4 = PY[r2, :, s1, :].T
            w = (a1 * b1 + a2 * b2) + (a3 * b3 + a4 * b4)
            w = w * HH  # (T, T)
            w4 = w.reshape((K, rmax, K, rmax))
            blk = _sum_axis(_sum_axis(w4, 3), 1)  # (K, K)
            S[:, pi * K:(pi + 1) * K, pj * K:(pj + 1) * K] = blk.limbs
    return HXF(S)


def trace_A_from_diag_h(A_Y: HXF, H: HXF, m: int, K: int, rmax: int) -> HXF:
    """Fast Tr(A_i Y) from diagonal pairings (MPMP.jl:1585-1618).
    A_Y: (m, m, T) -> (npairs*K,)."""
    outs = []
    for (r, s) in pair_list(m):
        w = A_Y[r, s] * H
        outs.append(_sum_axis(w.reshape((K, rmax)), 1))
    return HXF(np.concatenate([o.limbs for o in outs], axis=1))


def trace_A_generic_h(
    Z: HXF, V: HXF, H: HXF, m: int, K: int, rmax: int
) -> HXF:
    """Tr(A_i Z) for generic symmetric Z (MPMP.jl:1517-1584)."""
    delta, T = V.shape
    Zb = Z.reshape((m, delta, m, delta))
    outs = []
    for (r, s) in pair_list(m):
        Zrs = Zb[r, :, s, :]
        M = hxf_matmul(Zrs, V)  # (delta, T)
        D = _sum_axis(V * M, 0)  # (T,)
        w = (D * H).reshape((K, rmax))
        outs.append(_sum_axis(w, 1))
    return HXF(np.concatenate([o.limbs for o in outs], axis=1))


def weighted_A_block_h(
    a_j: HXF, V: HXF, H: HXF, m: int, K: int, rmax: int
) -> HXF:
    """sum_i a_i A_i on one (j, l) PSD block (MPMP.jl:1621-1678)."""
    delta, T = V.shape
    k = V.k
    out = np.zeros((k, m * delta, m * delta), dtype=np.float64)
    for p, (r, s) in enumerate(pair_list(m)):
        a_rs = a_j[p * K:(p + 1) * K]  # (K,)
        a_t = HXF(np.repeat(a_rs.limbs, rmax, axis=1))  # (T,)
        w = a_t * H
        U = V * w.reshape((1, T))
        W = hxf_matmul(U, V.T)  # (delta, delta)
        if r == s:
            out[:, r * delta:(r + 1) * delta, s * delta:(s + 1) * delta] += (
                W.limbs
            )
        else:
            Wh = W.scale2(0.5)
            out[:, r * delta:(r + 1) * delta, s * delta:(s + 1) * delta] += (
                Wh.limbs
            )
            out[:, s * delta:(s + 1) * delta, r * delta:(r + 1) * delta] += (
                Wh.T.limbs
            )
    return HXF(out)


# ---------------------------------------------------------------------------
# Block-diag helpers
# ---------------------------------------------------------------------------


class _JPool:
    """Worker pool over independent cluster work items — the host-path
    analogue of the reference's `Threads.@threads` over (j, l) loops
    (MPMP.jl:1435, 1454, 1751; SURVEY.md §2 parallelism table).

    Work items are submitted longest-processing-time-first by the given
    weights (the same blocksize^3 heuristic as the reference's
    distribute_weights_swapping, MPMP.jl:425-465) and results returned in
    input order, so every reduction downstream accumulates in a FIXED
    order — threaded runs are bitwise identical to serial runs.  The
    native kernels release the GIL inside ctypes calls, which is where
    the time goes; their inner OpenMP regions are work-size-gated, so
    many-small-cluster problems (the scaling case) never nest."""

    def __init__(self, threads: int):
        self.ex = ThreadPoolExecutor(threads) if threads > 1 else None

    def map(self, fn, items, weights=None):
        if self.ex is None or len(items) <= 1:
            return [fn(it) for it in items]
        order = list(range(len(items)))
        if weights is not None:
            order.sort(key=lambda i: -weights[i])
        futs = {}
        for i in order:
            futs[i] = self.ex.submit(fn, items[i])
        return [futs[i].result() for i in range(len(items))]

    def shutdown(self):
        if self.ex is not None:
            self.ex.shutdown()


def _resolve_host_threads(cfg, info: BlockInfo) -> int:
    n = getattr(cfg, "host_threads", None)
    if n is None:
        env = os.environ.get("CLRS_HOST_THREADS", "")
        n = int(env) if env else (os.cpu_count() or 1)
    if info.J < 2:
        return 1  # single cluster: nothing to fan out over
    return max(1, min(int(n), info.J))


def _bd_scalar_identity(info: BlockInfo, scale: float, k: int):
    out = []
    for j in range(info.J):
        row = []
        for l in range(info.L[j]):
            n = info.Y_blocksizes[j][l]
            e = HXF.eye(n, k=k)
            row.append(HXF(e.limbs * scale))
        out.append(row)
    return out


def _bd_dot(a, b) -> HXF:
    tot = None
    for aj, bj in zip(a, b):
        for al, bl in zip(aj, bj):
            d = hxf_dot(al, bl)
            tot = d if tot is None else tot + d
    return tot


def _bd_max_abs(P) -> float:
    e = 0.0
    for row in P:
        for blk in row:
            e = max(e, blk.max_abs())
    return e


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------


def solve_host(
    problem,
    cfg=None,
    initial_solutions=(),
    **kwargs,
):
    """Solve a packed SDPProblem on the host at its limb count k.

    `problem` is a core.problem.SDPProblem packed at the target k (use
    pack_constraints(..., k=10) for the reference's 512-bit regime) or an
    already-converted HostProblem.  Returns a core.solver.SolveResult.
    """
    from clrs_tpu.core.solver import SolveResult, SolverConfig

    if cfg is None:
        cfg = SolverConfig(**kwargs)
    hp = problem if isinstance(problem, HostProblem) else HostProblem(problem)
    info = hp.info
    k = hp.k
    Ktot = float(info.total_psd_size)
    n_y = info.n_y

    use_lu_inverse = cfg.use_lu_inverse
    use_lu_schur = cfg.use_lu_schur

    # cold start (MPMP.jl:659-686) or warm start
    if len(initial_solutions) == 4:
        x, y, X, Y = initial_solutions
        x = x if isinstance(x, HXF) else hxf_from_xf(x)
        y = y if isinstance(y, HXF) else hxf_from_xf(y)
        X = [[b if isinstance(b, HXF) else hxf_from_xf(b) for b in row]
             for row in X]
        Y = [[b if isinstance(b, HXF) else hxf_from_xf(b) for b in row]
             for row in Y]
        if hp.x_sigma is not None:
            x = x * hp.x_sigma
        if hp.y_R is not None:
            y = hxf_matmul(hp.y_R, y)
    else:
        x = HXF.zeros((info.total_dim_S, 1), k=k)
        y = HXF.zeros((n_y, 1), k=k)
        X = _bd_scalar_identity(info, cfg.omega_p, k)
        Y = _bd_scalar_identity(info, cfg.omega_d, k)

    def inv_fn_x(M):
        return hxf_inverse_lu(M) if use_lu_inverse else hxf_spd_inverse(M)

    # Schur-system factor-and-substitute (the reference's own scheme,
    # MPMP.jl:1417-1514): factor S_j / Q once, apply by triangular solves.
    # Materializing S^-1/Q^-1 (the XLA path's choice, where batched
    # matmuls beat sequential solves on device) costs ~1.6x more host
    # flops per iteration — measured 0.75 s/iter -> 0.40 s/iter on the
    # sp30 decomp (profiled round 3).
    def _factor_s(M):
        if use_lu_schur:
            LU, perm, ok = hxf_lu(M)
            return ("lu", LU, perm), ok
        Lc, ok = hxf_cholesky(M)
        return ("chol", Lc), ok

    def _fsolve(fac, rhs):
        if fac[0] == "lu":
            return hxf_lu_solve(fac[1], fac[2], rhs)
        t = hxf_solve_tril(fac[1], rhs)
        return hxf_solve_tril(fac[1], t, trans=True)

    # cluster-parallel worker pool (reference: Threads.@threads over j /
    # (j, l); results always reduced in fixed j order -> bitwise
    # deterministic at any thread count, asserted in tests)
    pool = _JPool(_resolve_host_threads(cfg, info))
    # try/finally: the pool must shut down on ANY exit — exceptions
    # inside the solve otherwise leak idle executor threads for the
    # rest of the process (ADVICE r3)
    try:
        jl_items = [(j, l) for j in range(info.J) for l in range(info.L[j])]
        jl_weights = [float(info.Y_blocksizes[j][l]) ** 3 for (j, l) in jl_items]
        j_weights = [
            float(info.dim_S[j]) ** 3
            + sum(float(bs) ** 3 for bs in info.Y_blocksizes[j])
            for j in range(info.J)
        ]

        def compute_residual_R(mu_s: HXF, dX=None, dY=None):
            R = []
            for j in range(info.J):
                row = []
                for l in range(info.L[j]):
                    n = info.Y_blocksizes[j][l]
                    t = HXF.eye(n, k=k) * mu_s - hxf_matmul(X[j][l], Y[j][l])
                    if dX is not None:
                        t = t - hxf_matmul(dX[j][l], dY[j][l])
                    row.append(t)
                R.append(row)
            return R

        def compute_weighted_A(a: HXF):
            def one(j):
                a_j = a[info.x_indices[j]:info.x_indices[j + 1], 0]
                return [
                    weighted_A_block_h(
                        a_j, hp.Vs[j][l], hp.Hs[j][l], info.m[j],
                        info.n_samples[j], info.rmax[j][l])
                    for l in range(info.L[j])
                ]

            return pool.map(one, list(range(info.J)), j_weights)

        header = (
            f"{'iter':>5} {'time(s)':>8} {'mu':>11} {'P-obj':>11} {'D-obj':>11} "
            f"{'gap':>10} {'P-error':>10} {'p-error':>10} {'d-error':>10} "
            f"{'alpha_p':>10} {'alpha_d':>10} {'beta':>10}"
        )
        if cfg.verbose:
            print(header)

        t0 = time.time()
        itn = 0
        pd_feas = False
        converged = False
        status = "max_iterations"
        gap = np.inf
        history: List[Dict[str, float]] = []
        best_merit = np.inf
        best_state = (x, y, X, Y)
        best_row = None
        best_res: Tuple[Any, Any, Any] = (None, None, None)
        last_res: Tuple[Any, Any, Any] = (None, None, None)
        stall_count = 0
        timings: Dict[str, float] = {}

        def timed(name, t_start):
            if itn > 2:
                timings[name] = timings.get(name, 0.0) + time.time() - t_start
            return time.time()

        while itn < cfg.maxiterations:
            itn += 1
            tphase = time.time()
            # ---- mu, R, X^-1 (MPMP.jl:755-801) ----
            mu = _bd_dot(X, Y) / Ktot
            mu_p = (HXF.zeros((), k=k) if pd_feas
                    else mu * cfg.beta_infeasible)
            R = compute_residual_R(mu_p)

            def _xinv_one(jl):
                inv, okb = inv_fn_x(X[jl[0]][jl[1]])
                return hxf_sym(inv), okb

            inv_res = pool.map(_xinv_one, jl_items, jl_weights)
            X_inv = [[None] * info.L[j] for j in range(info.J)]
            ok_inv = True
            for (j, l), (inv, okb) in zip(jl_items, inv_res):
                X_inv[j][l] = inv
                ok_inv = ok_inv and okb
            if not ok_inv:
                if not use_lu_inverse:
                    if cfg.verbose:
                        print("X^-1 Cholesky failed — switching to LU inverse")
                    use_lu_inverse = True
                    itn -= 1
                    continue
                status = "numerical_failure:Xinv"
                break
            tphase = timed("Xinv+R", tphase)

            # ---- decomposition (MPMP.jl:1218-1514; per-cluster work fanned
            # over the pool like the reference's @threads at :1424-1442).
            # Sub-phase buckets mirror the reference's decomposition table
            # (schur / cholS / Q, MPMP.jl:992-1001); under threading they sum
            # per-cluster work time (can exceed phase wall time). ----
            def _decomp_one(j):
                m, K = info.m[j], info.n_samples[j]
                dim = info.dim_S[j]
                tj0 = time.time()
                S_j = HXF.zeros((dim, dim), k=k)
                ay = []
                for l in range(info.L[j]):
                    PX = compute_pairings_h(X_inv[j][l], hp.Vs[j][l], m)
                    PY = compute_pairings_h(Y[j][l], hp.Vs[j][l], m)
                    ay.append(pairing_diag_h(PY, m))
                    S_j = S_j + schur_block_contribution_h(
                        PX, PY, hp.Hs[j][l], m, K, info.rmax[j][l])
                S_j = hxf_sym(S_j)
                tj1 = time.time()
                fac_j, okj = _factor_s(S_j)
                tj2 = time.time()
                if fac_j[0] == "chol":
                    # W = L^-1 B; S^-1 B = L^-T W; Q_j = W^T W via the
                    # symmetric-output syrk (half the gemm's cascade ops)
                    W = hxf_solve_tril(fac_j[1], hp.B[j])
                    SB = hxf_solve_tril(fac_j[1], W, trans=True)
                    Qj = hxf_syrk(W)
                else:
                    SB = _fsolve(fac_j, hp.B[j])
                    Qj = hxf_matmul(hp.B[j], SB, ta=True)
                tj3 = time.time()
                return S_j, fac_j, SB, Qj, ay, okj, (tj1 - tj0, tj2 - tj1,
                                                     tj3 - tj2)

            dres = pool.map(_decomp_one, list(range(info.J)), j_weights)
            if itn > 2:
                for sub in dres:
                    tt = sub[6]
                    timings["decomp.schur_build"] = timings.get(
                        "decomp.schur_build", 0.0) + tt[0]
                    timings["decomp.S_factor"] = timings.get(
                        "decomp.S_factor", 0.0) + tt[1]
                    timings["decomp.Q"] = timings.get("decomp.Q", 0.0) + tt[2]
            ok_s = True
            S_mat: List[HXF] = []
            S_fac: List[Any] = []
            S_inv_B: List[HXF] = []
            A_Y: List[List[HXF]] = []
            Q = HXF.zeros((n_y, n_y), k=k)
            for S_j, fac_j, SB, Qj, ay, okj, _tt in dres:  # fixed j order
                ok_s = ok_s and okj
                Q = Q + Qj
                S_mat.append(S_j)
                S_fac.append(fac_j)
                S_inv_B.append(SB)
                A_Y.append(ay)
            tq0 = time.time()
            Q_fac, okq = _factor_s(hxf_sym(Q))
            if itn > 2:
                timings["decomp.Q_factor"] = timings.get(
                    "decomp.Q_factor", 0.0) + time.time() - tq0
            ok_s = ok_s and okq
            if not ok_s:
                if not use_lu_schur:
                    if cfg.verbose:
                        print("Schur Cholesky failed — switching to LU for S, Q")
                    use_lu_schur = True
                    itn -= 1
                    continue
                status = "numerical_failure:schur_factorization"
                break
            tphase = timed("decomp", tphase)

            # ---- residuals (MPMP.jl:1107-1144) ----
            P = compute_weighted_A(x)
            for j in range(info.J):
                for l in range(info.L[j]):
                    t = P[j][l] - X[j][l]
                    if hp.C_blocks is not None:
                        t = t - hp.C_blocks[j][l]
                    P[j][l] = t
            p = hp.b
            for j in range(info.J):
                xj = x[info.x_indices[j]:info.x_indices[j + 1], :]
                p = p - hxf_matmul(hp.B[j], xj, ta=True)
            trY_parts = []
            for j in range(info.J):
                tr = None
                for l in range(info.L[j]):
                    t = trace_A_from_diag_h(
                        A_Y[j][l], hp.Hs[j][l], info.m[j], info.n_samples[j],
                        info.rmax[j][l])
                    tr = t if tr is None else tr + t
                trY_parts.append(tr)
            trY = HXF(np.concatenate([t.limbs for t in trY_parts], axis=1))
            cs = HXF(np.concatenate([hp.c[j].limbs for j in range(info.J)],
                                    axis=1))
            By = HXF(np.concatenate(
                [hxf_matmul(hp.B[j], y).limbs for j in range(info.J)], axis=1))
            d = (cs - By) - trY.reshape((info.total_dim_S, 1))
            tphase = timed("residuals", tphase)

            # ---- search direction (MPMP.jl:1682-1824) ----
            def saddle_solve(rx: HXF, ry: HXF):
                def stage1(j):
                    rj = rx[info.x_indices[j]:info.x_indices[j + 1], :]
                    tx = _fsolve(S_fac[j], rj)
                    return tx, hxf_matmul(hp.B[j], tx, ta=True)

                s1 = pool.map(stage1, list(range(info.J)), j_weights)
                temp = [t for t, _ in s1]
                acc = None
                for _, a in s1:  # fixed j order
                    acc = a if acc is None else acc + a
                dy_ = _fsolve(Q_fac, ry - acc)
                dxs_ = pool.map(
                    lambda j: temp[j] + hxf_matmul(S_inv_B[j], dy_),
                    list(range(info.J)), j_weights)
                return dxs_, dy_

            def saddle_residual(rx: HXF, ry: HXF, dxs_, dy_):
                def one(j):
                    rj = rx[info.x_indices[j]:info.x_indices[j + 1], :]
                    Sdx = hxf_matmul(S_mat[j], dxs_[j])
                    Bdy = hxf_matmul(hp.B[j], dy_)
                    return rj - Sdx + Bdy, hxf_matmul(hp.B[j], dxs_[j], ta=True)

                parts = pool.map(one, list(range(info.J)), j_weights)
                accb = None
                for _, a in parts:  # fixed j order
                    accb = a if accb is None else accb + a
                rx_full = HXF(np.concatenate([r_.limbs for r_, _ in parts],
                                             axis=1))
                return rx_full, ry - accb

            def direction(Rmat):
                def z_and_trace(j):
                    Zj = [
                        hxf_sym(hxf_matmul(
                            X_inv[j][l],
                            hxf_matmul(P[j][l], Y[j][l]) - Rmat[j][l]))
                        for l in range(info.L[j])
                    ]
                    tr = None
                    for l in range(info.L[j]):
                        t = trace_A_generic_h(
                            Zj[l], hp.Vs[j][l], hp.Hs[j][l], info.m[j],
                            info.n_samples[j], info.rmax[j][l])
                        tr = t if tr is None else tr + t
                    return tr

                tr_parts = pool.map(z_and_trace, list(range(info.J)), j_weights)
                trZ = HXF(np.concatenate([t.limbs for t in tr_parts], axis=1))
                rhs_x = -d - trZ.reshape((info.total_dim_S, 1))
                rhs_y = p
                dxs, dy = saddle_solve(rhs_x, rhs_y)
                for _ in range(cfg.refine_steps):
                    rx_full, ry_full = saddle_residual(rhs_x, rhs_y, dxs, dy)
                    ddxs, ddy = saddle_solve(rx_full, ry_full)
                    dxs = [dxs[j] + ddxs[j] for j in range(info.J)]
                    dy = dy + ddy
                dx = HXF(np.concatenate([d_.limbs for d_ in dxs], axis=1))
                dX = compute_weighted_A(dx)

                def dy_one(j):
                    dXj = [dX[j][l] + P[j][l] for l in range(info.L[j])]
                    dYj = [
                        hxf_sym(hxf_matmul(
                            X_inv[j][l],
                            Rmat[j][l] - hxf_matmul(dXj[l], Y[j][l])))
                        for l in range(info.L[j])
                    ]
                    return dXj, dYj

                dres2 = pool.map(dy_one, list(range(info.J)), j_weights)
                dY = []
                for j, (dXj, dYj) in enumerate(dres2):
                    dX[j] = dXj
                    dY.append(dYj)
                return dx, dX, dy, dY

            dx, dX, dy, dY = direction(R)
            tphase = timed("predictor_dir", tphase)

            # ---- corrector (MPMP.jl:832-858) ----
            XdX = [[X[j][l] + dX[j][l] for l in range(info.L[j])]
                   for j in range(info.J)]
            YdY = [[Y[j][l] + dY[j][l] for l in range(info.L[j])]
                   for j in range(info.J)]
            r_val = _bd_dot(XdX, YdY) / (mu * Ktot)
            one = HXF.from_float(1.0, k=k)
            beta = r_val * r_val if bool(r_val < one) else r_val
            if pd_feas:
                bF = HXF.from_float(cfg.beta_feasible, k=k)
                beta_c = bF if bool(beta < bF) else (
                    beta if bool(beta < one) else one)
            else:
                bI = HXF.from_float(cfg.beta_infeasible, k=k)
                beta_c = bI if bool(beta < bI) else beta
            mu_c = beta_c * mu
            R2 = compute_residual_R(mu_c, dX, dY)
            tphase = timed("corrector_R", tphase)
            dx, dX, dy, dY = direction(R2)
            tphase = timed("corrector_dir", tphase)

            # ---- step lengths (MPMP.jl:1829-1898; @threads over blocks at
            # :1842, global min reduction :1890-1891) ----
            def _steplen_one(jl):
                j, l = jl
                lp, okp = hxf_min_eig_sym(X[j][l], dX[j][l])
                ld, okd = hxf_min_eig_sym(Y[j][l], dY[j][l])
                return lp, ld, okp and okd

            sres = pool.map(_steplen_one, jl_items, jl_weights)
            lam_p = min([np.inf] + [r[0] for r in sres])
            lam_d = min([np.inf] + [r[1] for r in sres])
            ok_a = all(r[2] for r in sres)
            if not ok_a:
                status = "numerical_failure:steplength"
                break

            def alpha_of(lam):
                if lam > -cfg.gamma:
                    return 1.0
                return min(1.0, -cfg.gamma / min(lam, -1e-300))

            alpha_p = alpha_of(lam_p)
            alpha_d = alpha_of(lam_d)
            if pd_feas:
                alpha_p = alpha_d = min(alpha_p, alpha_d)
            tphase = timed("alpha", tphase)

            # ---- update + metrics (MPMP.jl:877-887, 1027-1092) ----
            # snapshot: this iteration's P/p/d (and the merit below) belong to
            # the PRE-update iterate — the stall guard must return this state,
            # not the post-update one (found round 3: an explosive final step
            # made "best" return the exploded iterate, p_err 2e-59 -> 1e10)
            prev_state = (x, y, X, Y)
            ap = HXF.from_float(alpha_p, k=k)
            ad = HXF.from_float(alpha_d, k=k)
            x = x + dx * ap
            y = y + dy * ad
            X = [[X[j][l] + dX[j][l] * ap for l in range(info.L[j])]
                 for j in range(info.J)]
            Y = [[Y[j][l] + dY[j][l] * ad for l in range(info.L[j])]
                 for j in range(info.J)]
            p_obj = hxf_dot(cs.reshape((info.total_dim_S, 1)), x) + hp.b0
            d_obj = hxf_dot(hp.b, y) + hp.b0
            if hp.C_blocks is not None:
                d_obj = d_obj + _bd_dot(hp.C_blocks, Y)
            gap_num = (p_obj - d_obj).abs()
            gap_den = p_obj + d_obj
            gd = max(1.0, gap_den.abs().max_abs())
            gap = gap_num.max_abs() / gd
            P_err = _bd_max_abs(P)
            p_err = p.max_abs()
            d_err = d.max_abs()
            primal_err = max(P_err, p_err)
            dual_err = d_err
            tphase = timed("update", tphase)

            row = dict(
                iter=itn, time=time.time() - t0,
                mu=float(mu.limbs[0]),
                p_obj=float(sum(p_obj.limbs[:3])),
                d_obj=float(sum(d_obj.limbs[:3])),
                gap=gap, P_err=P_err, p_err=p_err, d_err=d_err,
                alpha_p=alpha_p, alpha_d=alpha_d,
                beta=float(beta_c.limbs[0]),
            )
            history.append(row)
            last_res = (P, p, d)
            if cfg.verbose:
                print(
                    f"{itn:5d} {row['time']:8.1f} {row['mu']:11.3e} "
                    f"{row['p_obj']:11.3e} {row['d_obj']:11.3e} {gap:10.2e} "
                    f"{P_err:10.2e} {p_err:10.2e} {d_err:10.2e} "
                    f"{alpha_p:10.2e} {alpha_d:10.2e} {row['beta']:10.2e}"
                )

            # stall/explosion guard (core/solver.py analogue)
            merit = max(gap, primal_err, dual_err)
            if not np.isfinite(merit):
                merit = np.inf
            if merit < best_merit:
                best_merit = merit
                best_state = prev_state  # the state the residuals measure
                best_row = row
                best_res = (P, p, d)
                stall_count = 0
            else:
                exploded = merit > best_merit * cfg.blowup_factor
                stall_count += cfg.blowup_weight if exploded else 1
            if stall_count >= cfg.stall_patience:
                status = "stalled"
                x, y, X, Y = best_state
                if cfg.verbose:
                    print(
                        f"no progress for {cfg.stall_patience} iterations — "
                        "returning best iterate"
                    )
                break

            primal_feas = primal_err < cfg.primal_error_threshold
            dual_feas = dual_err < cfg.dual_error_threshold
            pd_feas = primal_feas and dual_feas
            if cfg.need_primal_feasible and primal_feas:
                status = "primal_feasible"
                converged = True
                break
            if cfg.need_dual_feasible and dual_feas:
                status = "dual_feasible"
                converged = True
                break
            if primal_feas and dual_feas and gap < cfg.duality_gap_threshold:
                status = "optimal"
                converged = True
                break

        if (
            status.startswith("numerical_failure") or status == "stalled"
        ) and best_row is not None:
            x, y, X, Y = best_state
            gap = best_row["gap"]

    finally:
        pool.shutdown()
    time_total = time.time() - t0
    if cfg.verbose:
        print(f"status: {status}  iterations: {itn}  time: {time_total:.2f}s")
        if timings:
            print("time per phase (excl. first 2 iterations):")
            for name, tval in sorted(timings.items(), key=lambda kv: -kv[1]):
                print(f"  {name:>14}: {tval:9.3f}s")

    report_row = history[-1] if history else None
    res_out = last_res
    if (
        status.startswith("numerical_failure") or status == "stalled"
    ) and best_row is not None:
        # best_row's gap/objectives were evaluated at the POST-update
        # iterate; recompute them at the returned (pre-update) best_state
        # so all SolveResult fields describe one iterate (ADVICE r3).
        bx, by, _, bY = best_state
        b_p_obj = hxf_dot(cs.reshape((info.total_dim_S, 1)), bx) + hp.b0
        b_d_obj = hxf_dot(hp.b, by) + hp.b0
        if hp.C_blocks is not None:
            b_d_obj = b_d_obj + _bd_dot(hp.C_blocks, bY)
        bgd = max(1.0, (b_p_obj + b_d_obj).abs().max_abs())
        gap = (b_p_obj - b_d_obj).abs().max_abs() / bgd
        report_row = dict(
            best_row,
            gap=gap,
            p_obj=float(sum(b_p_obj.limbs[:3])),
            d_obj=float(sum(b_d_obj.limbs[:3])),
        )
        res_out = best_res

    if hp.x_sigma is not None:
        x = x / hp.x_sigma
    if hp.y_R_inv is not None:
        y = hxf_matmul(hp.y_R_inv, y)
    return SolveResult(
        x=x, X=X, y=y, Y=Y,
        P=res_out[0], p=res_out[1], d=res_out[2],
        dual_gap=gap,
        primal_objective=report_row["p_obj"] if report_row else float("nan"),
        dual_objective=report_row["d_obj"] if report_row else float("nan"),
        time_total=time_total,
        iterations=itn,
        converged=converged,
        status=status,
        history=history,
        timings=timings,
    )


def solverank1sdp_host(
    constraints,
    b,
    blockinfo: Optional[BlockInfo] = None,
    C=None,
    b0=0,
    precision_k: int = 10,
    setup_prec_bits: Optional[int] = None,
    **kwargs,
):
    """Reference-style entry for the host high-precision path:
    pack at precision_k limbs (mpmath setup precision raised to cover
    53*k + margin bits) and solve with solve_host.  Never imports jax."""
    import mpmath

    from clrs_tpu.core.problem import prepare_pack_data

    need = setup_prec_bits or (53 * precision_k + 150)
    old = mpmath.mp.prec
    try:
        mpmath.mp.prec = max(old, need)
        data = prepare_pack_data(constraints, b, info=blockinfo, C=C, b0=b0)
    finally:
        mpmath.mp.prec = old
    hp = HostProblem.from_pack_data(data, precision_k)
    return solve_host(hp, **kwargs)
