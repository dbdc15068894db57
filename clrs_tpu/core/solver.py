"""The clustered low-rank SDP interior-point solver (XZ predictor-corrector).

TPU-native re-derivation of the reference's `solverank1sdp`
(MPMP.jl:595-1025).  The entire iteration body — residuals, bilinear
pairings, Schur assembly, factorization, predictor and corrector search
directions, step lengths, and variable update — is one jitted program over
extended-precision (XF) block-diagonal pytrees; the host boundary is only
the convergence check and the iteration log, matching the structure the
reference gets from Julia threads but with XLA doing the fusion and batching.

Algorithm (comments MPMP.jl:642-657):
  1. init (x, X, y, Y) = (0, Omega_p I, 0, Omega_d I), or warm start
  2. residuals P = sum_i A_i x_i - X - C, p = b - B^T x, d = c - Tr(A_* Y) - By
  3. mu = <X, Y>/K; mu_p = 0 if pd-feasible else beta_infeasible * mu
  4. predictor direction with R = mu_p I - XY
  5. corrector factor beta_c from r = <X+dX, Y+dY>/(mu K)
  6. corrector direction with R = mu_c I - XY - dX dY
  7. step lengths alpha = min(1, -gamma/lambda_min(L^-1 dM L^-T))
  8. x += a_p dx, X += a_p dX, y += a_d dy, Y += a_d dY
  until duality gap < 1e-15 and feasibility errors < 1e-30 (defaults from
  the SDPB paper / SDPA-GMP "slow but stable", MPMP.jl:599-615).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clrs_tpu.core.blockinfo import BlockInfo
from clrs_tpu.core.kernels import (
    compute_pairings,
    pairing_diag,
    schur_block_contribution,
    trace_A_from_diag,
    trace_A_generic,
    weighted_A_block,
)
from clrs_tpu.core.problem import (
    SDPProblem,
    bd_dot,
    bd_map,
    bd_scalar_identity,
)
from clrs_tpu.ops.linalg import (
    xf_cholesky,
    xf_inverse_lu,
    xf_lu,
    xf_lu_solve,
    xf_min_eig_sym,
    xf_solve_tril,
    xf_solve_triu,
    xf_spd_inverse,
    xf_sym,
)
from clrs_tpu.ops.xfloat import (
    XF,
    xf_abs,
    xf_add,
    xf_div,
    xf_matmul,
    xf_max,
    xf_min,
    xf_mul,
    xf_norm_max,
    xf_sum,
    xf_where,
)
from clrs_tpu.utils.limits import raised_recursion_limit


@dataclass(frozen=True)
class SolverConfig:
    """Solver options; defaults mirror the reference kwargs (MPMP.jl:599-615)."""

    maxiterations: int = 500
    beta_infeasible: float = 0.3
    beta_feasible: float = 0.1
    gamma: float = 0.7
    omega_p: float = 1e10
    omega_d: float = 1e10
    duality_gap_threshold: float = 1e-15
    primal_error_threshold: float = 1e-30
    dual_error_threshold: float = 1e-30
    need_primal_feasible: bool = False
    need_dual_feasible: bool = False
    stall_patience: int = 40  # stop after this many non-improving iterations
    # explosion detector: once the merit (max of gap and feasibility
    # errors) exceeds best*blowup_factor the iterates are past the
    # precision floor and every further step wastes time degrading — count
    # such iterations toward the stall budget with this weight so the run
    # ends within ~stall_patience/blowup_weight iterations of the blowup
    # (the reference has no floor: at 512 bits it meets its thresholds
    # first; our k-limb rungs hit the floor and must exit cleanly)
    blowup_factor: float = 1e3
    blowup_weight: int = 8
    host_threads: Optional[int] = None  # host-path (core/host_solver.py)
    # worker threads over clusters — the analogue of the reference's
    # Threads.@threads over (j, l) (MPMP.jl:1435, 1454, 1751).  None =
    # auto: $CLRS_HOST_THREADS, else os.cpu_count(); engaged only for
    # multi-cluster problems.  The XLA/TPU paths ignore this (blocks are
    # batched, not looped).
    verbose: bool = True
    testing: bool = False  # print early-iteration timings (MPMP.jl:612)
    profile_dir: Optional[str] = None  # write a jax.profiler trace of the
    # solve here (the TPU-native analogue of the reference's hand-rolled
    # 17-bucket phase timers, MPMP.jl:699-714, 888-921 / SURVEY.md §5.1);
    # view with tensorboard or xprof
    refine_steps: int = 1  # iterative-refinement rounds on the saddle solve
    # numerical degradation ladder (reference: sticky booleans, MPMP.jl:717-718)
    use_lu_inverse: bool = False  # X^-1 via LU instead of Cholesky
    use_lu_schur: bool = False  # S_j via LU instead of Cholesky
    use_mxu_matmul: bool = False  # pairing/weighted-A products through the
    # integer-sliced MXU matmul (ops/mxu_matmul.py) instead of the VPU
    # expansion matmul — the systolic-array path for large blocks on TPU
    use_pallas_inverse: bool = False  # X^-1 through the fused Pallas
    # SPD-inverse kernels (ops/pallas_dd.py at k=2, the limb-count-
    # parameterized ops/pallas_xf.py kernel at k>=3): whole batched
    # Cholesky+solve+W^T W per block in ONE kernel, VMEM-resident — removes
    # the per-column launch latency of the XLA fori_loop factorization and
    # keeps high-k factorizations off the XLA compile path
    use_pallas_matmul: Optional[bool] = None  # pairing/weighted-A/trace
    # products through the fused Pallas matmuls (ops/pallas_xf.py): the
    # tuned dd kernel at k=2, the limb-count-parameterized cascade kernel
    # at k in 3..8 — whole contraction VMEM-resident, no EFT-barrier
    # fusion breaks, and at k>=3 every matmul moved into the custom-call
    # also shrinks the XLA compile.  Default None = AUTO: on for the TPU
    # backend (measured round 2 on v5e: +16% it/s on BASELINE config 2,
    # sphere packing 2d=30; small products auto-fall back to the XLA path
    # inside the dispatch, so small-block configs are unchanged), off on
    # CPU.

    use_pallas_steplength: Optional[bool] = None  # step-length sandwich
    # L^-1 dM L^-T through the fused Pallas kernel (ops/pallas_xf.py,
    # k-limb Cholesky + two triangular solves in ONE kernel per block
    # group; the Jacobi eigenvalue bound stays in XLA).  Default None =
    # off (flip per-measurement; the XLA path is the proven default).

    scale_bits: int = 0  # SCALED-expansion mode (ops/xfloat.py
    # scaled_mode): store limb i multiplied by 2^(scale_bits*i) so f32
    # limb expansions keep full 24k-bit RELATIVE precision at any value
    # magnitude — plain f32 expansions hit the exponent floor at ~127
    # bits for O(1) values, capping the on-chip contract at ~k=6.  Use
    # 24 with f32 limbs (the TPU's 512-bit-class regime: k=14 f32 scaled
    # ~ 336 bits ~ the host k=6 f64 rung; k=22 ~ 528 bits ~ the
    # reference's setprecision(512), MPMP.jl:17).  The problem must be
    # packed with the SAME scale_bits (pack_constraints / solverank1sdp
    # thread it).  0 = plain expansions (default).

    split_direction: Optional[bool] = None  # run the direction phase as
    # THREE separately-jitted sub-phases (Z+rhs / saddle solve / dX+dY)
    # in the phase-split driver.  At high k the one-graph direction phase
    # is the largest remaining XLA HLO (its elementwise cascades are not
    # yet custom-calls) and can exceed the remote TPU compile helper's
    # memory budget (measured: k=14 scaled sp16 — helper SIGKILLed on the
    # direction phase after every other phase compiled).  Default None =
    # AUTO: split when k >= 10.

    def _split_direction(self, k: int) -> bool:
        if self.split_direction is None:
            return k >= 10
        return bool(self.split_direction)

    @property
    def _steplength_pallas(self) -> bool:
        return bool(self.use_pallas_steplength)

    @property
    def _matmul_mode(self):
        use_pallas = self.use_pallas_matmul
        if use_pallas is None:
            import jax

            use_pallas = jax.default_backend() == "tpu"
        return "pallas" if use_pallas else self.use_mxu_matmul


# ---------------------------------------------------------------------------
# Iteration pieces (each takes/returns pytrees; composed into one jit)
# ---------------------------------------------------------------------------


def _cluster_shapes(info: BlockInfo, j: int):
    m = info.m[j]
    K = info.n_samples[j]
    return m, K


def compute_residual_R(X, Y, mu: XF, info: BlockInfo, dX=None, dY=None):
    """R = mu I - XY (- dX dY)  (MPMP.jl:1189-1215), batched by block size."""
    from clrs_tpu.core.batched import map_blocks

    def fn(Xb, Yb):
        eye = XF.eye(Xb.shape[0], k=mu.k, dtype=mu.dtype)
        return xf_add(xf_mul(eye, mu), -xf_matmul(Xb, Yb))

    def fn2(Xb, Yb, dXb, dYb):
        eye = XF.eye(Xb.shape[0], k=mu.k, dtype=mu.dtype)
        t = xf_add(xf_mul(eye, mu), -xf_matmul(Xb, Yb))
        return xf_add(t, -xf_matmul(dXb, dYb))

    if dX is None:
        return map_blocks(fn, info, X, Y)
    return map_blocks(fn2, info, X, Y, dX, dY)


def compute_X_inv(X, info: BlockInfo, use_lu: bool, use_pallas: bool = False):
    """Per-block SPD inverse with ok flags (MPMP.jl:762-801), batched."""
    from clrs_tpu.core.batched import map_blocks

    if use_pallas and not use_lu:
        return _compute_X_inv_pallas(X, info)

    inv_fn = xf_inverse_lu if use_lu else xf_spd_inverse

    def fn(Xb):
        inv, okb = inv_fn(Xb)
        return xf_sym(inv), okb

    return map_blocks(fn, info, X, out_has_flag=True)


def _compute_X_inv_pallas(X, info: BlockInfo):
    """X^-1 via the fused Pallas SPD-inverse kernels, one call per
    block-size group (each grid program factors one block in VMEM):
    the tuned dd kernel at k=2 (ops/pallas_dd.py), the limb-count-
    parameterized kernel at k>=3 (ops/pallas_xf.py) — the latter keeps
    high-precision factorizations on-chip with XLA compile cost flat
    in k."""
    from clrs_tpu.core.batched import block_groups, stack_xf, unstack_xf
    from clrs_tpu.ops.pallas_dd import xf_spd_inverse_pallas_batched
    from clrs_tpu.ops.pallas_xf import xf_spd_inverse_pallas_k_batched

    interpret = jax.default_backend() == "cpu"
    out = [[None] * info.L[j] for j in range(info.J)]
    ok = jnp.bool_(True)
    for size, jls in block_groups(info).items():
        stacked = stack_xf([X[j][l] for (j, l) in jls])
        inv_fn = (
            xf_spd_inverse_pallas_batched
            if stacked.k == 2
            else xf_spd_inverse_pallas_k_batched
        )
        inv_limbs, okb = inv_fn(
            stacked.limbs, interpret=interpret
        )
        ok = ok & jnp.all(okb)
        for i, (j, l) in enumerate(jls):
            out[j][l] = XF(inv_limbs[:, i])
    return out, ok


def compute_decomposition(problem: SDPProblem, X_inv, Y, use_lu_schur: bool, use_mxu: bool = False):
    """Pairings + Schur complement + saddle-point factorization
    (MPMP.jl:1218-1514), one vmapped instance per cluster shape group.

    TPU-native deviation from the reference's factor-and-substitute scheme:
    S_j^-1 and Q^-1 are materialized here (via Cholesky or LU), so the
    twice-per-iteration direction solves (MPMP.jl:1743-1776) become pure
    matmuls — batched MXU work instead of sequential substitution loops.

    Returns dict with: S_inv and S_inv_B per cluster, Q_inv, A_Y (diagonal
    Y pairings for the fast Tr(A_* Y)), ok.
    """
    from clrs_tpu.core.batched import cluster_groups, stack_xf, unstack_xf

    info = problem.info
    ok = jnp.bool_(True)
    S_mat: List[Any] = [None] * info.J
    S_inv: List[Any] = [None] * info.J
    S_inv_B: List[Any] = [None] * info.J
    A_Y: List[Any] = [None] * info.J
    k = problem.b.k
    dtype = problem.b.dtype
    n_y = info.n_y
    if use_lu_schur:
        inv_fn = xf_inverse_lu
    elif use_mxu == "pallas" and jax.default_backend() == "tpu":
        # S_j^-1 and Q^-1 through the fused Pallas SPD-inverse kernel:
        # with the Schur assembly and matmuls already custom-calls, this
        # removes the last XLA factorization loops from the decomposition
        # phase — at high k (the scaled-f32 contract runs, k~14) the
        # XLA-side cascade HLO of a fori_loop Cholesky is the remaining
        # compile-cost driver
        def inv_fn(a):
            from clrs_tpu.ops.pallas_dd import xf_spd_inverse_pallas_batched
            from clrs_tpu.ops.pallas_xf import (
                xf_spd_inverse_pallas_k_batched,
            )

            f = (
                xf_spd_inverse_pallas_batched
                if a.k == 2
                else xf_spd_inverse_pallas_k_batched
            )
            inv_l, okb = f(a.limbs[:, None])
            return xf_sym(XF(inv_l[:, 0])), jnp.all(okb)
    else:
        inv_fn = xf_spd_inverse

    Q = XF.zeros((n_y, n_y), k=k, dtype=dtype)
    for js in cluster_groups(info):
        j0 = js[0]
        m, K = _cluster_shapes(info, j0)
        L = info.L[j0]
        rmaxs = info.rmax[j0]
        dim = info.dim_S[j0]

        def fn(Xinv_b, Y_b, Vs, Hs, B):
            S_j = XF.zeros((dim, dim), k=k, dtype=dtype)
            ay = []
            for l in range(L):
                PX = compute_pairings(Xinv_b[l], Vs[l], m, use_mxu)
                PY = compute_pairings(Y_b[l], Vs[l], m, use_mxu)
                ay.append(pairing_diag(PY, m))
                S_j = xf_add(
                    S_j,
                    schur_block_contribution(
                        PX, PY, Hs[l], m, K, rmaxs[l], use_mxu
                    ),
                )
            S_j = xf_sym(S_j)
            Sj_inv, okj = inv_fn(S_j)
            Sj_inv = xf_sym(Sj_inv)
            SB = xf_matmul(Sj_inv, B)
            Qp = xf_matmul(B.T, SB)
            return S_j, Sj_inv, SB, Qp, ay, okj

        if len(js) == 1:
            cl = problem.clusters[j0]
            Sm, Si, SB, Qp, ay, okj = fn(
                X_inv[j0], Y[j0], list(cl.Vs), list(cl.Hs), cl.B
            )
            S_mat[j0], S_inv[j0], S_inv_B[j0], A_Y[j0] = Sm, Si, SB, ay
            Q = xf_add(Q, Qp)
            ok = ok & okj
        else:
            ins = (
                [stack_xf([X_inv[j][l] for j in js]) for l in range(L)],
                [stack_xf([Y[j][l] for j in js]) for l in range(L)],
                [stack_xf([problem.clusters[j].Vs[l] for j in js]) for l in range(L)],
                [stack_xf([problem.clusters[j].Hs[l] for j in js]) for l in range(L)],
                stack_xf([problem.clusters[j].B for j in js]),
            )
            Sms, Sis, SBs, Qps, ays, oks = jax.vmap(
                fn, in_axes=1, out_axes=(1, 1, 1, 1, 1, 0)
            )(*ins)
            for i, j in enumerate(js):
                S_mat[j] = Sms[i]
                S_inv[j] = Sis[i]
                S_inv_B[j] = SBs[i]
                A_Y[j] = [ays[l][i] for l in range(L)]
            Q = xf_add(Q, xf_sum(Qps, axis=0))
            ok = ok & jnp.all(oks)

    # Q = B^T S^-1 B (n_y x n_y)  (MPMP.jl:1467-1505)
    Q_inv, okq = inv_fn(xf_sym(Q))
    ok = ok & okq

    return dict(
        S_mat=S_mat,
        S_inv=S_inv,
        S_inv_B=S_inv_B,
        Q_inv=Q_inv,
        A_Y=A_Y,
        ok=ok,
    )


def compute_weighted_A(problem: SDPProblem, a: XF, use_mxu: bool = False):
    """Block-diagonal sum_i a_i A_i (MPMP.jl:1621-1678), cluster-grouped."""
    from clrs_tpu.core.batched import cluster_groups, stack_xf

    info = problem.info
    out: List[Any] = [None] * info.J
    for js in cluster_groups(info):
        j0 = js[0]
        m, K = _cluster_shapes(info, j0)
        L = info.L[j0]
        rmaxs = info.rmax[j0]

        def fn(a_j, Vs, Hs):
            return [
                weighted_A_block(a_j, Vs[l], Hs[l], m, K, rmaxs[l], use_mxu)
                for l in range(L)
            ]

        if len(js) == 1:
            cl = problem.clusters[j0]
            a_j = a[info.x_indices[j0] : info.x_indices[j0 + 1], 0]
            out[j0] = fn(a_j, list(cl.Vs), list(cl.Hs))
        else:
            ins = (
                stack_xf(
                    [a[info.x_indices[j] : info.x_indices[j + 1], 0] for j in js]
                ),
                [stack_xf([problem.clusters[j].Vs[l] for j in js]) for l in range(L)],
                [stack_xf([problem.clusters[j].Hs[l] for j in js]) for l in range(L)],
            )
            rows = jax.vmap(fn, in_axes=1, out_axes=1)(*ins)
            for i, j in enumerate(js):
                out[j] = [rows[l][i] for l in range(L)]
    return out


def _concat_cluster_vecs(info, parts):
    return XF(
        jnp.concatenate([p.limbs for p in parts], axis=1)
    ).reshape((info.total_dim_S, 1))


def compute_trace_A_diag(problem: SDPProblem, A_Y):
    """Fast-path Tr(A_* Y) from stored diagonal pairings (MPMP.jl:1585-1618)."""
    from clrs_tpu.core.batched import cluster_groups, stack_xf

    info = problem.info
    parts: List[Any] = [None] * info.J
    for js in cluster_groups(info):
        j0 = js[0]
        m, K = _cluster_shapes(info, j0)
        L = info.L[j0]
        rmaxs = info.rmax[j0]

        def fn(ay, Hs):
            tr = None
            for l in range(L):
                t = trace_A_from_diag(ay[l], Hs[l], m, K, rmaxs[l])
                tr = t if tr is None else xf_add(tr, t)
            return tr

        if len(js) == 1:
            parts[j0] = fn(A_Y[j0], list(problem.clusters[j0].Hs))
        else:
            ins = (
                [stack_xf([A_Y[j][l] for j in js]) for l in range(L)],
                [stack_xf([problem.clusters[j].Hs[l] for j in js]) for l in range(L)],
            )
            trs = jax.vmap(fn, in_axes=1, out_axes=1)(*ins)
            for i, j in enumerate(js):
                parts[j] = trs[i]
    return _concat_cluster_vecs(info, parts)


def compute_trace_A_generic(problem: SDPProblem, Z, use_mxu: bool = False):
    """Tr(A_* Z) for a generic block-diagonal Z (MPMP.jl:1517-1584)."""
    from clrs_tpu.core.batched import cluster_groups, stack_xf

    info = problem.info
    parts: List[Any] = [None] * info.J
    for js in cluster_groups(info):
        j0 = js[0]
        m, K = _cluster_shapes(info, j0)
        L = info.L[j0]
        rmaxs = info.rmax[j0]

        def fn(Zb, Vs, Hs):
            tr = None
            for l in range(L):
                t = trace_A_generic(Zb[l], Vs[l], Hs[l], m, K, rmaxs[l], use_mxu)
                tr = t if tr is None else xf_add(tr, t)
            return tr

        if len(js) == 1:
            cl = problem.clusters[j0]
            parts[j0] = fn(Z[j0], list(cl.Vs), list(cl.Hs))
        else:
            ins = (
                [stack_xf([Z[j][l] for j in js]) for l in range(L)],
                [stack_xf([problem.clusters[j].Vs[l] for j in js]) for l in range(L)],
                [stack_xf([problem.clusters[j].Hs[l] for j in js]) for l in range(L)],
            )
            trs = jax.vmap(fn, in_axes=1, out_axes=1)(*ins)
            for i, j in enumerate(js):
                parts[j] = trs[i]
    return _concat_cluster_vecs(info, parts)


def compute_residuals(problem: SDPProblem, x, X, y, A_Y, use_mxu: bool = False,
                      Y=None):
    """P = sum A_i x_i - X - C;  p = b - B^T x;  d = c - Tr(A_* Y) - By
    (MPMP.jl:1107-1144).

    The trace term uses the fast diag-pairing path when A_Y is given
    (in-loop callers, MPMP.jl:1585-1618); pass A_Y=None with the Y blocks
    instead for one-off post-loop evaluation (e.g. the sharded driver's
    returned-iterate residuals) via the generic trace."""
    info = problem.info
    P = compute_weighted_A(problem, x, use_mxu)
    for j in range(info.J):
        for l in range(info.L[j]):
            t = xf_add(P[j][l], -X[j][l])
            if problem.C_blocks is not None:
                t = xf_add(t, -problem.C_blocks[j][l])
            P[j][l] = t

    # p = b - B^T x  (per-cluster partials then summed; the psum point in
    # the sharded path, SURVEY.md §5.8 (a)); grouped batched matmuls
    from clrs_tpu.core.batched import cluster_groups, stack_xf

    p = problem.b
    for js in cluster_groups(info):
        if len(js) == 1:
            j = js[0]
            xj = x[info.x_indices[j] : info.x_indices[j + 1], :]
            p = xf_add(p, -xf_matmul(problem.clusters[j].B.T, xj))
        else:
            Bs = stack_xf([problem.clusters[j].B for j in js])
            xs = stack_xf(
                [x[info.x_indices[j] : info.x_indices[j + 1], :] for j in js]
            )
            parts = jax.vmap(
                lambda Bb, xb: xf_matmul(Bb.T, xb), in_axes=1, out_axes=1
            )(Bs, xs)
            p = xf_add(p, -xf_sum(parts, axis=0))

    # d = c - Tr(A_* Y) - B y
    cs = XF(
        jnp.concatenate([problem.clusters[j].c.limbs for j in range(info.J)], axis=1)
    )
    By = XF(
        jnp.concatenate(
            [xf_matmul(problem.clusters[j].B, y).limbs for j in range(info.J)], axis=1
        )
    )
    if A_Y is not None:
        tr = compute_trace_A_diag(problem, A_Y)
    else:
        tr = compute_trace_A_generic(problem, Y, use_mxu)
    d = xf_add(xf_add(cs, -By), -tr)
    return P, p, d


def compute_direction_zrhs(problem, P, p, d, R, X_inv, Y,
                           use_mxu: bool = False):
    """Direction stage 1 (MPMP.jl:1698-1739): Z = Sym(X^-1 (P Y - R)),
    rhs_x = -d - Tr(A_* Z), rhs_y = p."""
    from clrs_tpu.core.batched import map_blocks

    info = problem.info
    Z = map_blocks(
        lambda Pb, Yb, Rb, Xib: xf_sym(
            xf_matmul(Xib, xf_add(xf_matmul(Pb, Yb), -Rb))
        ),
        info, P, Y, R, X_inv,
    )
    rhs_x = xf_add(-d, -compute_trace_A_generic(problem, Z, use_mxu))
    return rhs_x, p


def compute_direction_solve(problem, rhs_x, rhs_y, decomp,
                            refine_steps: int = 1):
    """Direction stage 2 (MPMP.jl:1743-1776): the saddle solve with
    iterative refinement; returns (dx concatenated, dy)."""
    from clrs_tpu.core.batched import cluster_groups, stack_xf

    info = problem.info

    # saddle solve of [S -B; B^T 0] (dx; dy) = (rhs_x; rhs_y) from the
    # materialized inverses — all matmuls (MPMP.jl:1743-1776 re-derived):
    #   t_j = S_j^-1 rhs_x_j;  dy = Q^-1 (rhs_y - sum_j B_j^T t_j);
    #   dx_j = t_j + S_j^-1 B_j dy; cluster-grouped batched matmuls
    def saddle_solve(rx, ry):
        temp_x: List[Any] = [None] * info.J
        acc = None
        for js in cluster_groups(info):
            if len(js) == 1:
                j = js[0]
                rj = rx[info.x_indices[j] : info.x_indices[j + 1], :]
                tx = xf_matmul(decomp["S_inv"][j], rj)
                a = xf_matmul(problem.clusters[j].B.T, tx)
                temp_x[j] = tx
                acc = a if acc is None else xf_add(acc, a)
            else:
                Sis = stack_xf([decomp["S_inv"][j] for j in js])
                rjs = stack_xf(
                    [rx[info.x_indices[j] : info.x_indices[j + 1], :] for j in js]
                )
                Bs = stack_xf([problem.clusters[j].B for j in js])
                txs, accs = jax.vmap(
                    lambda Si, rj, Bb: (
                        lambda tx: (tx, xf_matmul(Bb.T, tx))
                    )(xf_matmul(Si, rj)),
                    in_axes=1, out_axes=(1, 1),
                )(Sis, rjs, Bs)
                for i, j in enumerate(js):
                    temp_x[j] = txs[i]
                a = xf_sum(accs, axis=0)
                acc = a if acc is None else xf_add(acc, a)
        # dy (the psum point (c) in the sharded path, SURVEY.md §5.8)
        dy_ = xf_matmul(decomp["Q_inv"], xf_add(ry, -acc))
        dxs_: List[Any] = [None] * info.J
        for js in cluster_groups(info):
            if len(js) == 1:
                j = js[0]
                dxs_[j] = xf_add(temp_x[j], xf_matmul(decomp["S_inv_B"][j], dy_))
            else:
                SBs = stack_xf([decomp["S_inv_B"][j] for j in js])
                txs = stack_xf([temp_x[j] for j in js])
                outs = jax.vmap(
                    lambda SB, tx: xf_add(tx, xf_matmul(SB, dy_)),
                    in_axes=1, out_axes=1,
                )(SBs, txs)
                for i, j in enumerate(js):
                    dxs_[j] = outs[i]
        return dxs_, dy_

    def saddle_residual(dxs_, dy_):
        """rx - (S dx - B dy), ry - B^T dx — the true system residual."""
        rxs: List[Any] = [None] * info.J
        accb = None
        for js in cluster_groups(info):
            if len(js) == 1:
                j = js[0]
                rj = rhs_x[info.x_indices[j] : info.x_indices[j + 1], :]
                Sdx = xf_matmul(decomp["S_mat"][j], dxs_[j])
                Bdy = xf_matmul(problem.clusters[j].B, dy_)
                rxs[j] = xf_add(rj, xf_add(-Sdx, Bdy))
                a = xf_matmul(problem.clusters[j].B.T, dxs_[j])
                accb = a if accb is None else xf_add(accb, a)
            else:
                Sms = stack_xf([decomp["S_mat"][j] for j in js])
                Bs = stack_xf([problem.clusters[j].B for j in js])
                dxb = stack_xf([dxs_[j] for j in js])
                rjs = stack_xf(
                    [rhs_x[info.x_indices[j] : info.x_indices[j + 1], :] for j in js]
                )
                outs, accs = jax.vmap(
                    lambda Sm, Bb, dxj, rj: (
                        xf_add(rj, xf_add(-xf_matmul(Sm, dxj), xf_matmul(Bb, dy_))),
                        xf_matmul(Bb.T, dxj),
                    ),
                    in_axes=1, out_axes=(1, 1),
                )(Sms, Bs, dxb, rjs)
                for i, j in enumerate(js):
                    rxs[j] = outs[i]
                a = xf_sum(accs, axis=0)
                accb = a if accb is None else xf_add(accb, a)
        rx_full = XF(jnp.concatenate([r_.limbs for r_ in rxs], axis=1))
        ry_full = xf_add(rhs_y, -accb)
        return rx_full, ry_full

    dxs, dy = saddle_solve(rhs_x, rhs_y)
    # iterative refinement: one round squares the effective solve accuracy
    # (error eps*cond(S) -> (eps*cond(S))^2), which is what keeps the dual
    # residual contracting near convergence where cond(S) ~ 1/mu^2.
    for _ in range(refine_steps):
        rx_full, ry_full = saddle_residual(dxs, dy)
        ddxs, ddy = saddle_solve(rx_full, ry_full)
        dxs = [xf_add(dxs[j], ddxs[j]) for j in range(info.J)]
        dy = xf_add(dy, ddy)
    dx = XF(jnp.concatenate([d_.limbs for d_ in dxs], axis=1))
    return dx, dy


def compute_direction_dxdy(problem, P, R, X_inv, Y, dx,
                           use_mxu: bool = False):
    """Direction stage 3 (MPMP.jl:1779-1821): dX = P + sum_i dx_i A_i,
    dY = Sym(X^-1 (R - dX Y))."""
    from clrs_tpu.core.batched import map_blocks

    info = problem.info
    dX = compute_weighted_A(problem, dx, use_mxu)
    dX = bd_map(xf_add, dX, P)
    dY = map_blocks(
        lambda Rb, dXb, Yb, Xib: xf_sym(
            xf_matmul(Xib, xf_add(Rb, -xf_matmul(dXb, Yb)))
        ),
        info, R, dX, Y, X_inv,
    )
    return dX, dY


def compute_search_direction(problem, P, p, d, R, X_inv, Y, decomp,
                             use_lu_schur, refine_steps: int = 1,
                             use_mxu: bool = False):
    """Predictor/corrector direction via the saddle-point factorization
    (MPMP.jl:1682-1824) — the three stages composed (the phase-split
    driver can also run them as separate jits: at high k the one-graph
    direction phase is the largest remaining XLA HLO and can exceed the
    remote compile helper's memory budget)."""
    rhs_x, rhs_y = compute_direction_zrhs(problem, P, p, d, R, X_inv, Y,
                                          use_mxu)
    dx, dy = compute_direction_solve(problem, rhs_x, rhs_y, decomp,
                                     refine_steps)
    dX, dY = compute_direction_dxdy(problem, P, R, X_inv, Y, dx, use_mxu)
    return dx, dX, dy, dY


def compute_step_length(M, dM, gamma: float, info: BlockInfo,
                        use_pallas: bool = False):
    """alpha = min(1, -gamma/lambda_min), lambda_min over all blocks
    (MPMP.jl:1829-1898), batched.  Returns (alpha_f64, ok).

    The Pallas sandwich path bounds lambda_min with a NATIVE-dtype Jacobi
    sweep on the value-rounded L^-1 dM L^-T — fine for f32 limbs (the XLA
    path rounds to the same f32 there), but for f64 limbs the XLA path's
    xf_eigvalsh_approx keeps expansion precision, so f64-limb problems
    stay on the XLA path regardless of the flag (ADVICE r3)."""
    from clrs_tpu.core.batched import map_block_scalar

    if use_pallas:
        first = next(
            b for row in M for b in row if b is not None
        )
        if first.dtype == jnp.float64:
            use_pallas = False
    if use_pallas:
        lam, ok = _step_length_lambda_pallas(M, dM, info)
    else:
        lam, ok = map_block_scalar(xf_min_eig_sym, info, M, dM)
    alpha = jnp.where(lam > -gamma, 1.0, -gamma / jnp.minimum(lam, -1e-300))
    alpha = jnp.minimum(alpha, 1.0)
    return alpha, ok


def _step_length_lambda_pallas(M, dM, info: BlockInfo):
    """lambda_min via the fused Pallas sandwich kernel: the k-limb
    Cholesky + two triangular solves run in ONE kernel per block-size
    group (ops/pallas_xf.xf_steplen_sandwich_pallas_k), the Jacobi
    eigenvalue bound stays in XLA on the value-rounded output (same
    native-dtype accuracy the XLA path feeds it).  Scalar blocks keep
    the XLA path (lam = dM/M, no factorization to fuse)."""
    from clrs_tpu.core.batched import block_groups, stack_xf
    from clrs_tpu.ops.linalg import jacobi_min_eig
    from clrs_tpu.ops.pallas_xf import xf_steplen_sandwich_pallas_k

    interpret = jax.default_backend() == "cpu"
    val = jnp.inf
    ok = jnp.bool_(True)
    for size, jls in block_groups(info).items():
        Ms = stack_xf([M[j][l] for (j, l) in jls])
        Ds = stack_xf([dM[j][l] for (j, l) in jls])
        if size == 1:
            if len(jls) == 1:
                v, okb = xf_min_eig_sym(Ms[0], Ds[0])
                vs, oks = v[None], okb[None]
            else:
                vs, oks = jax.vmap(
                    xf_min_eig_sym, in_axes=1, out_axes=(0, 0))(Ms, Ds)
            val = jnp.minimum(val, jnp.min(vs))
            ok = ok & jnp.all(oks)
            continue
        W, okb = xf_steplen_sandwich_pallas_k(
            jnp.swapaxes(Ms.limbs, 0, 1), jnp.swapaxes(Ds.limbs, 0, 1),
            interpret=interpret,
        )
        Ws = (W + jnp.swapaxes(W, -1, -2)) * 0.5
        lam = jax.vmap(jacobi_min_eig)(Ws)
        val = jnp.minimum(val, jnp.min(lam).astype(jnp.float64))
        ok = ok & jnp.all(okb)
    return val, ok


def compute_error_bd(P) -> XF:
    """max |entry| over a block-diagonal (MPMP.jl:1036-1043)."""
    e = None
    for row in P:
        for b in row:
            m = xf_norm_max(b)
            e = m if e is None else xf_max(e, m)
    return e


def compute_primal_objective(problem: SDPProblem, x: XF) -> XF:
    cs = XF(
        jnp.concatenate(
            [problem.clusters[j].c.limbs for j in range(problem.info.J)], axis=1
        )
    )
    from clrs_tpu.ops.xfloat import xf_dot

    return xf_add(xf_dot(cs, x), problem.b0)


def compute_dual_objective(problem: SDPProblem, y: XF, Y) -> XF:
    from clrs_tpu.ops.xfloat import xf_dot

    obj = xf_add(xf_dot(problem.b, y), problem.b0)
    if problem.C_blocks is not None:
        obj = xf_add(obj, bd_dot(problem.C_blocks, Y))
    return obj


def compute_duality_gap(p_obj: XF, d_obj: XF) -> XF:
    """|p - d| / max(1, |p + d|)  (MPMP.jl:1066-1078)."""
    num = xf_abs(xf_add(p_obj, -d_obj))
    den = xf_max(
        XF.ones((), k=p_obj.k, dtype=p_obj.dtype), xf_abs(xf_add(p_obj, d_obj))
    )
    return xf_div(num, den)


# ---------------------------------------------------------------------------
# The jitted iteration
# ---------------------------------------------------------------------------


def make_ipm_phases(problem: SDPProblem, cfg: SolverConfig):
    """Build the per-phase jitted functions for this problem's shapes.

    The iteration is split into separately-jitted phases rather than one
    monolithic graph: XLA compile time is superlinear in HLO size, the
    direction phase is shared by predictor and corrector (one compile, two
    calls), and the host-side phase boundaries give exactly the per-phase
    timing instrumentation the reference hand-rolls (MPMP.jl:699-714,
    888-921 — decomp/directions/alpha/Xinv/R/res buckets).
    """
    info = problem.info
    k = problem.b.k
    dtype = problem.b.dtype
    Ktot = info.total_psd_size

    @jax.jit
    def phase_mu_R_Xinv(problem, state, pd_feas):
        x, y, X, Y = state
        mu = xf_div(bd_dot(X, Y), XF.from_float(float(Ktot), k=k, dtype=dtype))
        zero = XF.zeros((), k=k, dtype=dtype)
        mu_p = xf_where(pd_feas, zero, xf_mul(mu, cfg.beta_infeasible))
        R = compute_residual_R(X, Y, mu_p, info)
        X_inv, ok_inv = compute_X_inv(
            X, info, cfg.use_lu_inverse, cfg.use_pallas_inverse
        )
        return mu, R, X_inv, ok_inv

    @jax.jit
    def phase_decomp(problem, X_inv, Y):
        return compute_decomposition(
            problem, X_inv, Y, cfg.use_lu_schur, cfg._matmul_mode
        )

    @jax.jit
    def phase_residuals(problem, x, X, y, A_Y):
        return compute_residuals(problem, x, X, y, A_Y, cfg._matmul_mode)

    @jax.jit
    def phase_direction(problem, P, p, d, R, X_inv, Y, decomp):
        return compute_search_direction(
            problem, P, p, d, R, X_inv, Y, decomp, cfg.use_lu_schur,
            cfg.refine_steps, cfg._matmul_mode,
        )

    # sub-phase split of the direction (high-k compile-budget mode,
    # SolverConfig.split_direction): three graphs each a fraction of the
    # one-phase HLO — at k=14 scaled the one-graph direction phase
    # OOM-killed the remote compile helper while every other phase fit
    @jax.jit
    def phase_dir_zrhs(problem, P, p, d, R, X_inv, Y):
        return compute_direction_zrhs(
            problem, P, p, d, R, X_inv, Y, cfg._matmul_mode)

    @jax.jit
    def phase_dir_solve(problem, rhs_x, rhs_y, decomp):
        return compute_direction_solve(
            problem, rhs_x, rhs_y, decomp, cfg.refine_steps)

    @jax.jit
    def phase_dir_dxdy(problem, P, R, X_inv, Y, dx):
        return compute_direction_dxdy(
            problem, P, R, X_inv, Y, dx, cfg._matmul_mode)

    @jax.jit
    def phase_corrector_R(X, Y, dX, dY, mu, pd_feas):
        # corrector factor (MPMP.jl:832-837)
        XdX = bd_map(xf_add, X, dX)
        YdY = bd_map(xf_add, Y, dY)
        r = xf_div(
            bd_dot(XdX, YdY),
            xf_mul(mu, XF.from_float(float(Ktot), k=k, dtype=dtype)),
        )
        one = XF.ones((), k=k, dtype=dtype)
        beta = xf_where(r < one, xf_mul(r, r), r)
        beta_inf = XF.from_float(cfg.beta_infeasible, k=k, dtype=dtype)
        beta_fea = XF.from_float(cfg.beta_feasible, k=k, dtype=dtype)
        beta_c = xf_where(
            pd_feas,
            xf_min(xf_max(beta_fea, beta), one),
            xf_max(beta_inf, beta),
        )
        mu_c = xf_mul(beta_c, mu)
        R2 = compute_residual_R(X, Y, mu_c, info, dX, dY)
        return beta_c, R2

    @jax.jit
    def phase_steplength(M, dM):
        return compute_step_length(M, dM, cfg.gamma, info,
                                   use_pallas=cfg._steplength_pallas)

    @jax.jit
    def phase_update(problem, state, dx, dy, dX, dY, alpha_p, alpha_d, pd_feas, P, p, d, mu, beta_c):
        x, y, X, Y = state
        both = jnp.minimum(alpha_p, alpha_d)
        alpha_p = jnp.where(pd_feas, both, alpha_p)
        alpha_d = jnp.where(pd_feas, both, alpha_d)
        ap = XF.from_float(alpha_p.astype(dtype), k=k)
        ad = XF.from_float(alpha_d.astype(dtype), k=k)
        x_new = xf_add(x, xf_mul(dx, ap))
        y_new = xf_add(y, xf_mul(dy, ad))
        X_new = bd_map(lambda Xb, dXb: xf_add(Xb, xf_mul(dXb, ap)), X, dX)
        Y_new = bd_map(lambda Yb, dYb: xf_add(Yb, xf_mul(dYb, ad)), Y, dY)

        p_obj = compute_primal_objective(problem, x_new)
        d_obj = compute_dual_objective(problem, y_new, Y_new)
        gap = compute_duality_gap(p_obj, d_obj)
        P_err = compute_error_bd(P)
        p_err = xf_norm_max(p)
        d_err = xf_norm_max(d)
        primal_err = xf_max(P_err, p_err)
        diag = dict(
            mu=mu.to_float64(),
            p_obj=p_obj.to_float64(),
            d_obj=d_obj.to_float64(),
            gap=gap.to_float64(),
            gap_hi=gap.limbs[0],
            P_err=P_err.to_float64(),
            p_err=p_err.to_float64(),
            d_err=d_err.to_float64(),
            primal_err_hi=primal_err.limbs[0],
            dual_err_hi=d_err.limbs[0],
            alpha_p=alpha_p,
            alpha_d=alpha_d,
            beta_c=beta_c.to_float64(),
        )
        return (x_new, y_new, X_new, Y_new), diag

    out = dict(
        mu_R_Xinv=phase_mu_R_Xinv,
        decomp=phase_decomp,
        residuals=phase_residuals,
        direction=phase_direction,
        dir_zrhs=phase_dir_zrhs,
        dir_solve=phase_dir_solve,
        dir_dxdy=phase_dir_dxdy,
        corrector_R=phase_corrector_R,
        steplength=phase_steplength,
        update=phase_update,
    )
    return _wrap_scaled(out, cfg.scale_bits)


def _wrap_scaled(fns: dict, scale_bits: int) -> dict:
    """Wrap phase callables so every call (and hence every trace) runs
    under scaled_mode(scale_bits) — the flag is trace-time state in
    ops/xfloat, and re-traces happen inside calls, not at build time."""
    if not scale_bits:
        return fns
    import functools as _ft

    from clrs_tpu.ops.xfloat import scaled_mode

    def wrap(f):
        @_ft.wraps(f)
        def g(*a, **kw):
            with scaled_mode(scale_bits):
                return f(*a, **kw)

        return g

    return {name: wrap(f) for name, f in fns.items()}


def make_fused_step(problem: SDPProblem, cfg: SolverConfig):
    """One whole IPM iteration as a single jitted call.

    For devices reached over a dispatch-latency-heavy path (e.g. a remote
    TPU), one dispatch per iteration beats the phase-split driver; the
    phase-split variant compiles faster and gives per-phase timings.
    Returns a jitted fn: (state, pd_feas) -> (state', diag).
    """
    phases = make_ipm_phases(problem, cfg)

    def step(problem, state, pd_feas):
        mu, R, X_inv, ok_inv = phases["mu_R_Xinv"](problem, state, pd_feas)
        decomp = phases["decomp"](problem, X_inv, state[3])
        P, p, d = phases["residuals"](problem, state[0], state[2], state[1], decomp["A_Y"])
        dx, dX, dy, dY = phases["direction"](problem, P, p, d, R, X_inv, state[3], decomp)
        beta_c, R2 = phases["corrector_R"](state[2], state[3], dX, dY, mu, pd_feas)
        dx, dX, dy, dY = phases["direction"](problem, P, p, d, R2, X_inv, state[3], decomp)
        alpha_p, ok_p = phases["steplength"](state[2], dX)
        alpha_d, ok_d = phases["steplength"](state[3], dY)
        new_state, diag = phases["update"](
            problem, state, dx, dy, dX, dY, alpha_p, alpha_d, pd_feas, P, p, d, mu, beta_c
        )
        diag["ok"] = ok_inv & decomp["ok"] & ok_p & ok_d
        return new_state, diag

    return _wrap_scaled(dict(step=jax.jit(step)), cfg.scale_bits)["step"]


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


def classify_failure(kind: str, *tensors) -> str:
    """Distinguish exponent-range overflow from a genuine factorization
    failure (TODO.md f32 range guard; VERDICT round-1 weak #9).

    With f32 limbs (the TPU numerics) values overflow at 3.4e38 and a
    Cholesky/LU of an inf/nan matrix reports ok=False exactly like a
    not-SPD matrix — but the right advice differs: not-SPD escalates the
    factorization/precision ladder, overflow needs RESCALING (smaller
    omega, per-tensor pow2 prescale, or f64 limbs).  The reference never
    faces this: BigFloat's exponent is unbounded (MPMP.jl:17).

    tensors: state pytrees to host-check for finiteness (hi limbs carry
    the magnitude).  Returns "numerical_failure:<kind>" or
    "overflow:<kind>".
    """
    import jax

    for t in tensors:
        for leaf in jax.tree_util.tree_leaves(t):
            arr = np.asarray(getattr(leaf, "limbs", leaf))
            if not np.all(np.isfinite(arr[0] if arr.ndim else arr)):
                return f"overflow:{kind}"
    return f"numerical_failure:{kind}"


def initial_state(problem: SDPProblem, cfg: SolverConfig):
    """Cold start (MPMP.jl:659-686)."""
    info = problem.info
    k = problem.b.k
    dtype = problem.b.dtype
    x = XF.zeros((info.total_dim_S, 1), k=k, dtype=dtype)
    y = XF.zeros((info.n_y, 1), k=k, dtype=dtype)
    X = bd_scalar_identity(info, cfg.omega_p, k=k, dtype=dtype)
    Y = bd_scalar_identity(info, cfg.omega_d, k=k, dtype=dtype)
    return x, y, X, Y


@dataclass
class SolveResult:
    """Return bundle mirroring the reference's tuple (MPMP.jl:1014-1024).

    P (block-diag), p, d are the residuals at the returned iterate
    (MPMP.jl:1014-1020), expressed in the solver's INTERNAL preconditioned
    coordinates (trace-equilibrated x, orthonormalized y-basis) — their
    max-abs values are exactly the P/p/d errors the convergence contract
    checks.  x and y themselves are untransformed to user coordinates.
    """

    x: XF
    X: Any
    y: XF
    Y: Any
    P: Any
    p: XF
    d: XF
    dual_gap: float
    primal_objective: float
    dual_objective: float
    time_total: float
    iterations: int
    converged: bool
    status: str
    history: List[Dict[str, float]] = field(default_factory=list)
    timings: Dict[str, float] = field(default_factory=dict)
    rungs: List[Dict[str, Any]] = field(default_factory=list)  # escalation
    # per-rung log (core/escalate.py); empty for direct single-rung solves


def solverank1sdp(
    constraints=None,
    b=None,
    blockinfo: Optional[BlockInfo] = None,
    problem: Optional[SDPProblem] = None,
    C=None,
    b0=0,
    initial_solutions=(),
    precision_k: int = 2,
    dtype=None,
    **kwargs,
) -> SolveResult:
    """Solve the clustered low-rank SDP.

    Two entry forms, mirroring the reference (MPMP.jl:595-614):
      - reference-style: solverank1sdp(constraints, b, blockinfo; ...)
        with constraints[j] = (A, B, c, H) nested host data, or
      - packed: solverank1sdp(problem=SDPProblem, ...).

    dtype None = auto: f32 limbs on the TPU backend (f64 there is
    non-IEEE f32-pair emulation), f64 elsewhere.
    """
    cfg = SolverConfig(**kwargs)
    from clrs_tpu.ops.xfloat import scaled_mode

    if problem is None:
        from clrs_tpu.core.problem import pack_constraints

        if dtype is None:
            dtype = (
                np.float32 if jax.default_backend() == "tpu" else np.float64
            )
        problem = pack_constraints(
            constraints, b, info=blockinfo, C=C, b0=b0, k=precision_k,
            dtype=dtype, scale_bits=cfg.scale_bits,
        )
    info = problem.info

    with scaled_mode(cfg.scale_bits):
        if len(initial_solutions) == 4:
            state = list(initial_solutions)
            if problem.x_sigma is not None:
                # user-facing x -> internal equilibrated scaling
                state[0] = xf_mul(state[0], problem.x_sigma)
            if problem.y_R is not None:
                # user-facing y -> internal orthonormalized y-basis
                state[1] = xf_matmul(problem.y_R, state[1])
            state = tuple(state)
        else:
            state = initial_state(problem, cfg)

    phases = make_ipm_phases(problem, cfg)

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
    primal_err = np.inf
    dual_err = np.inf
    history: List[Dict[str, float]] = []
    best_merit = np.inf
    best_state = state
    best_row = None
    best_res = (None, None, None)  # (P, p, d) at the best iterate
    last_res = (None, None, None)
    stall_count = 0
    # per-phase wall-clock buckets (reference's timings array, MPMP.jl:738-740;
    # first 2 iterations excluded as compile time, MPMP.jl:888-898)
    timings: Dict[str, float] = {}

    iter_times: Dict[str, float] = {}  # current-iteration phase times

    def timed(name, fn, *args):
        t = time.time()
        # first call of each jitted phase traces it; high-k cascade traces
        # exceed CPython's default frame limit (utils/limits)
        with jax.profiler.TraceAnnotation(f"ipm/{name}"), \
                raised_recursion_limit():
            out = fn(*args)
            jax.block_until_ready(out)
        dt = time.time() - t
        if itn > 2:
            timings[name] = timings.get(name, 0.0) + dt
        iter_times[name] = iter_times.get(name, 0.0) + dt
        return out

    if cfg.profile_dir:
        jax.profiler.start_trace(cfg.profile_dir)
    while itn < cfg.maxiterations:
        itn += 1
        iter_times = {}
        pd = jnp.bool_(pd_feas)
        mu, R, X_inv, ok_inv = timed("Xinv+R", phases["mu_R_Xinv"], problem, state, pd)
        if not bool(np.asarray(ok_inv)):
            # classify first: an f32 exponent-range overflow looks exactly
            # like "not SPD" to the factorization, but switching to LU
            # would just hit the same infs — report rescale advice instead
            status = classify_failure("Xinv", state, mu)
            if status.startswith("overflow"):
                if cfg.verbose:
                    print(
                        "overflow: rescale — a value exceeded the f32 "
                        "exponent range (3.4e38); reduce omega, prescale "
                        "the problem, or use f64 limbs"
                    )
                break
            # sticky degradation ladder (MPMP.jl:762-801): Cholesky-based
            # SPD inverse failed -> switch to LU for the rest of the run
            if not cfg.use_lu_inverse:
                if cfg.verbose:
                    print(
                        "X^-1 Cholesky failed — switching to LU inverse "
                        "(reference ladder, MPMP.jl:774-786)"
                    )
                import dataclasses

                cfg = dataclasses.replace(cfg, use_lu_inverse=True)
                phases = make_ipm_phases(problem, cfg)
                itn -= 1
                continue
            break
        decomp = timed("decomp", phases["decomp"], problem, X_inv, state[3])
        if not bool(np.asarray(decomp["ok"])):
            status = classify_failure(
                "schur_factorization", X_inv, decomp["S_mat"])
            if status.startswith("overflow"):
                if cfg.verbose:
                    print(
                        "overflow: rescale — a value exceeded the f32 "
                        "exponent range (3.4e38); reduce omega, prescale "
                        "the problem, or use f64 limbs"
                    )
                break
            # Schur Cholesky failed -> sticky LU (MPMP.jl:1429-1441 note)
            if not cfg.use_lu_schur:
                if cfg.verbose:
                    print(
                        "Schur Cholesky failed — switching to LU "
                        "factorization for S and Q"
                    )
                import dataclasses

                cfg = dataclasses.replace(cfg, use_lu_schur=True)
                phases = make_ipm_phases(problem, cfg)
                itn -= 1
                continue
            break
        P, p, d = timed(
            "residuals", phases["residuals"], problem, state[0], state[2], state[1], decomp["A_Y"]
        )

        if cfg._split_direction(problem.b.k):
            def run_direction(tag, Rx):
                rx, ry = timed(f"{tag}_dir", phases["dir_zrhs"],
                               problem, P, p, d, Rx, X_inv, state[3])
                dx_, dy_ = timed(f"{tag}_dir", phases["dir_solve"],
                                 problem, rx, ry, decomp)
                dX_, dY_ = timed(f"{tag}_dir", phases["dir_dxdy"],
                                 problem, P, Rx, X_inv, state[3], dx_)
                return dx_, dX_, dy_, dY_
        else:
            def run_direction(tag, Rx):
                return timed(f"{tag}_dir", phases["direction"],
                             problem, P, p, d, Rx, X_inv, state[3], decomp)

        dx, dX, dy, dY = run_direction("predictor", R)
        beta_c, R2 = timed(
            "corrector_R", phases["corrector_R"], state[2], state[3], dX, dY, mu, pd
        )
        dx, dX, dy, dY = run_direction("corrector", R2)
        alpha_p, ok_p = timed("alpha", phases["steplength"], state[2], dX)
        alpha_d, ok_d = timed("alpha", phases["steplength"], state[3], dY)
        if not (bool(np.asarray(ok_p)) and bool(np.asarray(ok_d))):
            status = classify_failure("steplength", dX, dY)
            break
        # this iteration's P/p/d (and the merit below) measure the
        # PRE-update iterate; the stall guard must return that state, not
        # the post-update one (an explosive final step otherwise makes
        # "best" the exploded iterate — found round 3 on the host path)
        prev_state = state
        state, diag = timed(
            "update",
            phases["update"],
            problem, state, dx, dy, dX, dY, alpha_p, alpha_d, pd, P, p, d, mu, beta_c,
        )
        diag = {kk: np.asarray(v) for kk, v in diag.items()}
        gap = float(diag["gap_hi"])
        primal_err = float(diag["primal_err_hi"])
        dual_err = float(diag["dual_err_hi"])
        row = dict(
            iter=itn,
            time=time.time() - t0,
            mu=float(diag["mu"]),
            p_obj=float(diag["p_obj"]),
            d_obj=float(diag["d_obj"]),
            gap=gap,
            P_err=float(diag["P_err"]),
            p_err=float(diag["p_err"]),
            d_err=float(diag["d_err"]),
            alpha_p=float(diag["alpha_p"]),
            alpha_d=float(diag["alpha_d"]),
            beta=float(diag["beta_c"]),
        )
        history.append(row)
        last_res = (P, p, d)
        if cfg.verbose:
            print(
                f"{itn:5d} {row['time']:8.1f} {row['mu']:11.3e} "
                f"{row['p_obj']:11.3e} {row['d_obj']:11.3e} {gap:10.2e} "
                f"{row['P_err']:10.2e} {row['p_err']:10.2e} {row['d_err']:10.2e} "
                f"{row['alpha_p']:10.2e} {row['alpha_d']:10.2e} {row['beta']:10.2e}"
            )
        if cfg.testing and itn <= 5:
            # early-iteration phase timings (the reference's testing=true
            # prints, MPMP.jl:612, 899-921)
            print(
                "  phases: "
                + " ".join(f"{n}={t:.3f}s" for n, t in iter_times.items())
            )

        # stall safeguard (not in the reference, which loops to
        # maxiterations, MPMP.jl:742-753): once progress stops — the
        # precision floor reached or the system degenerate — keep the best
        # iterate and stop instead of iterating into breakdown.
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
            state = best_state
            if cfg.verbose:
                print(
                    f"no progress for {cfg.stall_patience} iterations — "
                    "returning best iterate (escalate precision to go further)"
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

    if cfg.profile_dir:
        jax.profiler.stop_trace()

    if (
        status.startswith(("numerical_failure", "overflow"))
        or status == "stalled"
    ) and best_row is not None:
        # hand back the best iterate (and its metrics), not the broken one.
        # best_row's gap/objectives came from phase_update, which evaluates
        # the POST-update iterate — recompute them at the returned
        # (pre-update) state so every SolveResult field describes the same
        # iterate as the residuals (ADVICE r3).
        state = best_state
        with scaled_mode(cfg.scale_bits):
            bp_obj = compute_primal_objective(problem, best_state[0])
            bd_obj = compute_dual_objective(
                problem, best_state[1], best_state[3])
            gap = float(
                np.asarray(compute_duality_gap(bp_obj, bd_obj).limbs[0]))
        best_row = dict(
            best_row,
            gap=gap,
            p_obj=float(np.asarray(bp_obj.to_float64())),
            d_obj=float(np.asarray(bd_obj.to_float64())),
        )

    time_total = time.time() - t0
    if cfg.verbose:
        print(f"status: {status}  iterations: {itn}  time: {time_total:.2f}s")
        if timings:
            # end-of-run phase report (reference MPMP.jl:972-1012)
            print("time per phase (excl. first 2 iterations):")
            for name, tval in sorted(timings.items(), key=lambda kv: -kv[1]):
                print(f"  {name:>14}: {tval:9.3f}s")

    report_row = history[-1] if history else None
    res_out = last_res
    if (
        status.startswith(("numerical_failure", "overflow"))
        or status == "stalled"
    ) and best_row is not None:
        report_row = best_row
        res_out = best_res

    x, y, X, Y = state
    with scaled_mode(cfg.scale_bits):
        if problem.x_sigma is not None:
            # internal equilibrated x -> user-facing scaling
            x = xf_div(x, problem.x_sigma)
        if problem.y_R_inv is not None:
            # internal orthonormalized y-basis -> user-facing y
            y = xf_matmul(problem.y_R_inv, y)
    return SolveResult(
        x=x,
        X=X,
        y=y,
        Y=Y,
        P=res_out[0],
        p=res_out[1],
        d=res_out[2],
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
