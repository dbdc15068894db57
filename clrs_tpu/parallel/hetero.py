"""Heterogeneous cluster-sharded IPM step over a device mesh.

The reference load-balances arbitrary mixes of cluster shapes over CPU
threads (distribute_weights_swapping + Threads.@threads, MPMP.jl:425-499).
The TPU equivalent here: clusters are grouped into *bundles* of identical
shape signature (m, K, per-l delta/rmax) — stacked on a batch axis — and
every bundle's cluster axis is sharded over the same mesh axis "cluster".
One SPMD step (a single shard_map/jit) runs all bundles: per-bundle compute
is vmapped, and the five cross-cluster reductions (SURVEY.md §5.8:
p-partials, Q-partials, dy rhs, step-length min, scalar dots) are the only
communication, all O(n_y^2) or smaller.

Bundles whose cluster count does not divide the mesh are padded with dummy
clusters (V=H=B=c=0) carried by a `valid` mask:
  - the padded Schur block gets +I (else S is singular);
  - the padded primal residual P is masked to 0 (else dX=-X caps alpha);
  - padded step-length eigenvalues are masked to +inf;
  - padded <X,Y> contributions are masked out of mu/r/objectives.
Everything else is zero by construction (B=c=H=0 rows contribute exact
zeros to p, d, Q, dy).

Unlike parallel/sharded.py's homogeneous demo step (L=1 synthetic data),
this path consumes a real packed SDPProblem (core/problem.py), supports
multiple inner blocks per cluster (L>1), any limb count k, and is the
multi-chip/multi-host execution path for the reference's applications
(sphere packing: one big polynomial cluster + many 1x1 sign clusters,
examples/SpherePacking.jl:99-105).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from clrs_tpu.core.blockinfo import BlockInfo
from clrs_tpu.core.kernels import (
    compute_pairings,
    pairing_diag,
    schur_block_contribution,
    trace_A_from_diag,
    trace_A_generic,
    weighted_A_block,
)
from clrs_tpu.core.problem import SDPProblem
from clrs_tpu.ops.linalg import (
    xf_inverse_lu,
    xf_min_eig_sym,
    xf_spd_inverse,
    xf_sym,
)
from clrs_tpu.ops.xfloat import (
    XF,
    xf_add,
    xf_div,
    xf_matmul,
    xf_mul,
    xf_sum,
    xf_where,
)


@dataclass(frozen=True)
class BundleShape:
    """Static shape signature of one cluster bundle (jit-static)."""

    J: int  # clusters in the bundle INCLUDING divisibility padding
    J_real: int  # clusters that carry real data
    m: int
    K: int
    deltas: Tuple[int, ...]  # per inner block l
    rmaxs: Tuple[int, ...]

    @property
    def L(self) -> int:
        return len(self.deltas)

    @property
    def npairs(self) -> int:
        return self.m * (self.m + 1) // 2

    @property
    def dim_S(self) -> int:
        return self.npairs * self.K

    def bs(self, l: int) -> int:
        return self.m * self.deltas[l]

    @property
    def psd_size(self) -> int:
        return sum(self.bs(l) for l in range(self.L))


def _signature(info: BlockInfo, j: int):
    return (
        info.m[j],
        info.n_samples[j],
        tuple(info.delta[j]),
        tuple(info.rmax[j]),
    )


def _stack1(xs: Sequence[XF]) -> XF:
    """Stack XF leaves on a new value axis 0 (limbs axis 1)."""
    return XF(jnp.stack([x.limbs for x in xs], axis=1))


def bundles_from_problem(
    problem: SDPProblem, n_devices: int
) -> Tuple[List[BundleShape], List[Dict[str, Any]], List[List[int]]]:
    """Group a packed problem's clusters into homogeneous bundles, padding
    each bundle's cluster count to a multiple of n_devices.

    Returns (shapes, data, owners) where owners[b] lists the original
    cluster indices j of bundle b's real slots (for scattering x back).
    """
    info = problem.info
    groups: Dict[tuple, List[int]] = {}
    order: List[tuple] = []
    for j in range(info.J):
        sig = _signature(info, j)
        if sig not in groups:
            groups[sig] = []
            order.append(sig)
        groups[sig].append(j)

    shapes: List[BundleShape] = []
    data: List[Dict[str, Any]] = []
    owners: List[List[int]] = []
    k = problem.b.k
    dtype = problem.b.dtype
    n_y = info.n_y
    for sig in order:
        js = groups[sig]
        m, K, deltas, rmaxs = sig
        J_real = len(js)
        J = -(-J_real // n_devices) * n_devices  # round up
        shape = BundleShape(J=J, J_real=J_real, m=m, K=K,
                            deltas=tuple(deltas), rmaxs=tuple(rmaxs))
        cl = [problem.clusters[j] for j in js]

        def padstack(leaves: List[XF], zshape) -> XF:
            pads = [XF.zeros(zshape, k=k, dtype=dtype)] * (J - J_real)
            return _stack1(list(leaves) + pads)

        V = [
            padstack([c.Vs[l] for c in cl], (deltas[l], K * rmaxs[l]))
            for l in range(shape.L)
        ]
        H = [
            padstack([c.Hs[l] for c in cl], (K * rmaxs[l],))
            for l in range(shape.L)
        ]
        B = padstack([c.B for c in cl], (shape.dim_S, n_y))
        c_ = padstack([c.c for c in cl], (shape.dim_S, 1))
        valid = jnp.asarray(
            [1.0] * J_real + [0.0] * (J - J_real), dtype=dtype
        )
        entry = dict(V=tuple(V), H=tuple(H), B=B, c=c_, valid=valid)
        if problem.C_blocks is not None:
            # cost matrix C (MPMP.jl:589-592): padded clusters carry C=0
            bs = [shape.bs(l) for l in range(shape.L)]
            entry["C"] = tuple(
                padstack([problem.C_blocks[j][l] for j in js], (bs[l], bs[l]))
                for l in range(shape.L)
            )
        data.append(entry)
        shapes.append(shape)
        owners.append(js)
    return shapes, data, owners


def initial_bundle_state(
    shapes: Sequence[BundleShape],
    omega_p: float,
    omega_d: float,
    k: int,
    dtype,
    n_y: int,
):
    """Cold start (MPMP.jl:659-686): x=0, y=0, X=omega_p I, Y=omega_d I.
    Padded clusters start at X=Y=I (any SPD value works; they are masked)."""
    bstates = []
    for sh in shapes:
        x = XF.zeros((sh.J, sh.dim_S, 1), k=k, dtype=dtype)
        Xs, Ys = [], []
        for l in range(sh.L):
            bs = sh.bs(l)
            eye = jnp.broadcast_to(jnp.eye(bs, dtype=dtype), (sh.J, bs, bs))
            Xs.append(XF.from_float(eye * omega_p, k=k))
            Ys.append(XF.from_float(eye * omega_d, k=k))
        bstates.append((x, tuple(Xs), tuple(Ys)))
    y = XF.zeros((n_y, 1), k=k, dtype=dtype)
    return tuple(bstates), y


def make_cluster_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("cluster",))


def hetero_specs(shapes: Sequence[BundleShape], has_C: bool = False):
    """PartitionSpec trees for the bundle data and state pytrees (the
    cluster axis of every bundle leaf is sharded over mesh axis
    "cluster"; XF leaves carry a leading limb axis, hence the None)."""
    clus = P(None, "cluster")
    rep = P()

    def entry(sh):
        d = dict(
            V=tuple(clus for _ in sh.deltas),
            H=tuple(clus for _ in sh.deltas),
            B=clus, c=clus, valid=P("cluster"),
        )
        if has_C:
            d["C"] = tuple(clus for _ in sh.deltas)
        return d

    data_specs = tuple(entry(sh) for sh in shapes)
    bstate_specs = tuple(
        (clus, tuple(clus for _ in sh.deltas), tuple(clus for _ in sh.deltas))
        for sh in shapes
    )
    state_spec = (bstate_specs, rep)
    return data_specs, state_spec


def globalize(tree, spec_tree, mesh: Mesh):
    """Turn host-replicated (identical on every process) arrays into GLOBAL
    jax.Arrays laid out per spec_tree over a (possibly multi-process) mesh.

    Single-process meshes pass through unchanged (jit moves the data).  In a
    multi-process run every process builds the same full-size host data
    (problem setup is deterministic), and each contributes the shards its
    addressable devices own — the multi-host analogue of the reference's
    shared-memory problem data (MPMP.jl is single-process; SURVEY.md §5.8).
    """
    from jax.sharding import NamedSharding

    if jax.process_count() == 1:
        return tree

    def leaf(x, spec):
        full = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(full.shape, sh,
                                            lambda idx: full[idx])

    # spec trees treat XF leaves as single leaves (their limbs array)
    def is_spec_leaf(n):
        return isinstance(n, P)

    flat_specs = jax.tree_util.tree_leaves(
        spec_tree, is_leaf=is_spec_leaf)
    flat_vals, treedef = jax.tree_util.tree_flatten(tree)
    assert len(flat_specs) == len(flat_vals), (
        len(flat_specs), len(flat_vals))
    out = [leaf(v, s) for v, s in zip(flat_vals, flat_specs)]
    return jax.tree_util.tree_unflatten(treedef, out)


def make_hetero_step(
    shapes: Sequence[BundleShape],
    mesh: Mesh,
    b: XF,
    cfg=None,
    b0: Optional[XF] = None,
    has_C: bool = False,
):
    """Build the jitted cluster-sharded IPM step over all bundles.

    Call signature of the returned function:
      (data: tuple of bundle dicts, state: (bstates, y), pd_feas: bool)
      -> ((bstates, y), diag)
    where bstates[b] = (x_b, X_b tuple, Y_b tuple).

    Feature parity with core/solver.py: C_blocks/b0 in residuals and the
    dual objective (has_C; MPMP.jl:589-592), saddle iterative refinement
    (cfg.refine_steps), and the Cholesky->LU degradation ladders
    (cfg.use_lu_inverse / cfg.use_lu_schur; diag reports ok_inv and
    ok_schur separately so the driver can switch the right one).
    """
    from clrs_tpu.core.solver import SolverConfig

    cfg = cfg or SolverConfig()
    k = b.k
    dtype = b.dtype
    n_y = b.shape[0]
    beta_inf = cfg.beta_infeasible
    gamma = cfg.gamma
    Ktot = float(sum(sh.J_real * sh.psd_size for sh in shapes))
    nB = len(shapes)
    inv_x = xf_inverse_lu if cfg.use_lu_inverse else xf_spd_inverse
    inv_s = xf_inverse_lu if cfg.use_lu_schur else xf_spd_inverse

    def allsum(v: XF) -> XF:
        """Sum a per-cluster XF over ALL clusters of one bundle: all-gather
        the per-device partials and tree-sum in canonical cluster order
        (full XF precision, bitwise identical for any device count)."""
        gathered = jax.lax.all_gather(v.limbs, "cluster", axis=1, tiled=True)
        return xf_sum(XF(gathered), axis=0)

    def vb(fn, *in_axes):
        return jax.vmap(fn, in_axes=in_axes or 1, out_axes=1)

    def step_spmd(data, state, pd_feas):
        bstates, y = state
        infs = []  # collected scalars

        # ---- mu = <X, Y> / Ktot over real clusters of all bundles ----
        mu_parts = []
        for bi, sh in enumerate(shapes):
            x_b, Xs, Ys = bstates[bi]
            valid = data[bi]["valid"]
            percl = None
            for l in range(sh.L):
                d = jax.vmap(
                    lambda Xj, Yj: xf_sum(xf_mul(Xj, Yj).reshape((-1,)), axis=0),
                    in_axes=1, out_axes=1,
                )(Xs[l], Ys[l])
                percl = d if percl is None else xf_add(percl, d)
            percl = XF(percl.limbs * valid[None, :])
            mu_parts.append(allsum(percl))
        mu_sum = mu_parts[0]
        for t in mu_parts[1:]:
            mu_sum = xf_add(mu_sum, t)
        mu = xf_div(mu_sum, Ktot)
        zero = XF.zeros((), k=k, dtype=dtype)
        mu_p = xf_where(pd_feas, zero, xf_mul(mu, beta_inf))

        # ---- per-bundle: R, X^-1, decomposition, residual pieces ----
        ok_inv = jnp.bool_(True)
        ok_schur = jnp.bool_(True)
        ok = jnp.bool_(True)
        bundle_ws: List[Dict[str, Any]] = [dict() for _ in range(nB)]
        Q = XF.zeros((n_y, n_y), k=k, dtype=dtype)
        p_acc = None
        for bi, sh in enumerate(shapes):
            x_b, Xs, Ys = bstates[bi]
            d_b = data[bi]
            valid = d_b["valid"]
            m, K = sh.m, sh.K
            ws = bundle_ws[bi]

            Rs, Xinvs = [], []
            for l in range(sh.L):
                bs = sh.bs(l)
                eye = XF.eye(bs, k=k, dtype=dtype)
                Rs.append(vb(
                    lambda Xj, Yj, eye=eye: xf_add(
                        xf_mul(eye, mu_p), -xf_matmul(Xj, Yj))
                )(Xs[l], Ys[l]))
                inv, oki = jax.vmap(
                    inv_x, in_axes=1, out_axes=(1, 0))(Xs[l])
                Xinvs.append(vb(xf_sym)(inv))
                ok_inv = ok_inv & jnp.all(oki)
            ws["R"] = Rs
            ws["Xinv"] = Xinvs

            def percl_decomp(valid_j, B_j, *XYVH):
                Xinv_l = XYVH[:sh.L]
                Y_l = XYVH[sh.L:2 * sh.L]
                V_l = XYVH[2 * sh.L:3 * sh.L]
                H_l = XYVH[3 * sh.L:4 * sh.L]
                S_j = XF.zeros((sh.dim_S, sh.dim_S), k=k, dtype=dtype)
                ay = []
                for l in range(sh.L):
                    PX = compute_pairings(Xinv_l[l], V_l[l], m)
                    PY = compute_pairings(Y_l[l], V_l[l], m)
                    ay.append(pairing_diag(PY, m))
                    S_j = xf_add(S_j, schur_block_contribution(
                        PX, PY, H_l[l], m, K, sh.rmaxs[l]))
                S_j = xf_sym(S_j)
                # identity for padded clusters (S would be singular)
                eye = XF.eye(sh.dim_S, k=k, dtype=dtype)
                S_j = xf_add(S_j, XF(eye.limbs * (1.0 - valid_j)))
                S_inv, okj = inv_s(S_j)
                S_inv = xf_sym(S_inv)
                SB = xf_matmul(S_inv, B_j)
                Qp = xf_matmul(B_j.T, SB)
                return S_j, S_inv, SB, Qp, tuple(ay), okj

            in_ax = (0, 1) + (1,) * (4 * sh.L)
            S_mat, S_inv, SB, Qpart, A_Y, ok_s = jax.vmap(
                percl_decomp, in_axes=in_ax,
                out_axes=(1, 1, 1, 1, tuple(1 for _ in range(sh.L)), 0),
            )(valid, d_b["B"], *Xinvs, *Ys, *d_b["V"], *d_b["H"])
            ok_schur = ok_schur & jnp.all(ok_s)
            ws["S_mat"], ws["S_inv"], ws["SB"], ws["A_Y"] = (
                S_mat, S_inv, SB, A_Y)
            Q = xf_add(Q, allsum(Qpart))

            # residuals: P per l (masked), p partial, d
            # P = sum_i x_i A_i - X - C  (MPMP.jl:1107-1125)
            Ps = []
            for l in range(sh.L):
                P_l = vb(
                    lambda x_j, V_j, H_j, X_j, l=l: xf_add(
                        weighted_A_block(
                            x_j[:, 0], V_j, H_j, m, K, sh.rmaxs[l]),
                        -X_j,
                    )
                )(x_b, d_b["V"][l], d_b["H"][l], Xs[l])
                if has_C:
                    P_l = xf_add(P_l, -d_b["C"][l])
                Ps.append(XF(P_l.limbs * valid[None, :, None, None]))
            ws["P"] = Ps
            pp = allsum(vb(lambda B_j, x_j: xf_matmul(B_j.T, x_j))(d_b["B"], x_b))
            p_acc = pp if p_acc is None else xf_add(p_acc, pp)
            trY = None
            for l in range(sh.L):
                t = jax.vmap(
                    lambda ay, H_j, l=l: trace_A_from_diag(
                        ay, H_j, m, K, sh.rmaxs[l]),
                    in_axes=1, out_axes=1,
                )(A_Y[l], d_b["H"][l])
                trY = t if trY is None else xf_add(trY, t)
            ws["d"] = xf_add(
                xf_add(d_b["c"], -XF(trY.limbs[..., None])),
                -vb(lambda B_j: xf_matmul(B_j, y))(d_b["B"]),
            )

        p = xf_add(b, -p_acc)
        Q_inv, ok_q = inv_s(xf_sym(Q))
        ok_schur = ok_schur & ok_q

        # ---- saddle solve pieces (MPMP.jl:1743-1776, re-derived as
        # matmuls against the materialized inverses; identical math to
        # core/solver.py's saddle_solve/saddle_residual) ----
        def saddle_solve(rxs, ry):
            """rxs[bi]: (dim_S, 1) per cluster; ry: (n_y, 1) replicated.
            Returns (dxs per bundle, dy)."""
            acc = None
            txs = []
            for bi, sh in enumerate(shapes):
                d_b = data[bi]
                ws = bundle_ws[bi]
                tx = vb(lambda S_inv_j, r_j: xf_matmul(S_inv_j, r_j))(
                    ws["S_inv"], rxs[bi])
                txs.append(tx)
                a = allsum(vb(lambda B_j, t_j: xf_matmul(B_j.T, t_j))(
                    d_b["B"], tx))
                acc = a if acc is None else xf_add(acc, a)
            dy = xf_matmul(Q_inv, xf_add(ry, -acc))
            dxs = []
            for bi, sh in enumerate(shapes):
                ws = bundle_ws[bi]
                dxs.append(vb(lambda t_j, SB_j: xf_add(
                    t_j, xf_matmul(SB_j, dy)))(txs[bi], ws["SB"]))
            return dxs, dy

        def saddle_residual(rxs, ry, dxs, dy):
            """True system residual: rx - (S dx - B dy), ry - sum B^T dx."""
            rrs = []
            accb = None
            for bi, sh in enumerate(shapes):
                d_b = data[bi]
                ws = bundle_ws[bi]
                rr = vb(
                    lambda r_j, S_j, dx_j, B_j: xf_add(
                        r_j, xf_add(-xf_matmul(S_j, dx_j),
                                    xf_matmul(B_j, dy)))
                )(rxs[bi], ws["S_mat"], dxs[bi], d_b["B"])
                rrs.append(rr)
                a = allsum(vb(lambda B_j, dx_j: xf_matmul(B_j.T, dx_j))(
                    d_b["B"], dxs[bi]))
                accb = a if accb is None else xf_add(accb, a)
            return rrs, xf_add(ry, -accb)

        # ---- search directions (shared by predictor/corrector) ----
        def directions(Rs_all):
            rxs = []
            for bi, sh in enumerate(shapes):
                x_b, Xs, Ys = bstates[bi]
                d_b = data[bi]
                ws = bundle_ws[bi]
                m, K = sh.m, sh.K

                def percl_rhs(d_j, *rest):
                    P_l = rest[:sh.L]
                    R_l = rest[sh.L:2 * sh.L]
                    Xinv_l = rest[2 * sh.L:3 * sh.L]
                    Y_l = rest[3 * sh.L:4 * sh.L]
                    V_l = rest[4 * sh.L:5 * sh.L]
                    H_l = rest[5 * sh.L:6 * sh.L]
                    trZ = None
                    for l in range(sh.L):
                        Z = xf_sym(xf_matmul(
                            Xinv_l[l],
                            xf_add(xf_matmul(P_l[l], Y_l[l]), -R_l[l])))
                        t = trace_A_generic(
                            Z, V_l[l], H_l[l], m, K, sh.rmaxs[l])
                        trZ = t if trZ is None else xf_add(trZ, t)
                    return xf_add(-d_j, -XF(trZ.limbs[..., None]))

                rxs.append(jax.vmap(
                    percl_rhs, in_axes=(1,) * (1 + 6 * sh.L), out_axes=1
                )(ws["d"], *ws["P"], *Rs_all[bi], *ws["Xinv"],
                  *Ys, *d_b["V"], *d_b["H"]))

            dxs, dy = saddle_solve(rxs, p)
            # iterative refinement (as core/solver.py): each round squares
            # the effective solve accuracy eps*cond(S)
            for _ in range(cfg.refine_steps):
                rrs, rry = saddle_residual(rxs, p, dxs, dy)
                ddxs, ddy = saddle_solve(rrs, rry)
                dxs = [xf_add(dxs[bi], ddxs[bi]) for bi in range(nB)]
                dy = xf_add(dy, ddy)

            outs = []
            for bi, sh in enumerate(shapes):
                x_b, Xs, Ys = bstates[bi]
                d_b = data[bi]
                ws = bundle_ws[bi]
                m, K = sh.m, sh.K
                dx = dxs[bi]
                dXs, dYs = [], []
                for l in range(sh.L):
                    dX_l = vb(
                        lambda dx_j, V_j, H_j, P_j, l=l: xf_add(
                            weighted_A_block(
                                dx_j[:, 0], V_j, H_j, m, K, sh.rmaxs[l]),
                            P_j,
                        )
                    )(dx, d_b["V"][l], d_b["H"][l], ws["P"][l])
                    dY_l = vb(
                        lambda R_j, dX_j, Y_j, Xi_j: xf_sym(
                            xf_matmul(Xi_j, xf_add(
                                R_j, -xf_matmul(dX_j, Y_j))))
                    )(Rs_all[bi][l], dX_l, Ys[l], ws["Xinv"][l])
                    dXs.append(dX_l)
                    dYs.append(dY_l)
                outs.append((dx, tuple(dXs), tuple(dYs)))
            return outs, dy

        R_all = [ws["R"] for ws in bundle_ws]
        d_dirs, dy = directions(R_all)

        # ---- corrector (MPMP.jl:832-858) ----
        r_parts = []
        for bi, sh in enumerate(shapes):
            x_b, Xs, Ys = bstates[bi]
            dx, dXs, dYs = d_dirs[bi]
            valid = data[bi]["valid"]
            percl = None
            for l in range(sh.L):
                d = jax.vmap(
                    lambda Xj, dXj, Yj, dYj: xf_sum(
                        xf_mul(xf_add(Xj, dXj), xf_add(Yj, dYj)
                               ).reshape((-1,)), axis=0),
                    in_axes=1, out_axes=1,
                )(Xs[l], dXs[l], Ys[l], dYs[l])
                percl = d if percl is None else xf_add(percl, d)
            percl = XF(percl.limbs * valid[None, :])
            r_parts.append(allsum(percl))
        r_sum = r_parts[0]
        for t in r_parts[1:]:
            r_sum = xf_add(r_sum, t)
        r = xf_div(r_sum, xf_mul(mu, Ktot))
        one = XF.ones((), k=k, dtype=dtype)
        beta = xf_where(r < one, xf_mul(r, r), r)
        bF = XF.from_float(cfg.beta_feasible, k=k, dtype=dtype)
        bI = XF.from_float(beta_inf, k=k, dtype=dtype)
        beta_c = xf_where(
            pd_feas,
            xf_where(beta < bF, bF, xf_where(beta < one, beta, one)),
            xf_where(beta < bI, bI, beta),
        )
        mu_c = xf_mul(beta_c, mu)

        R2_all = []
        for bi, sh in enumerate(shapes):
            x_b, Xs, Ys = bstates[bi]
            dx, dXs, dYs = d_dirs[bi]
            R2 = []
            for l in range(sh.L):
                bs = sh.bs(l)
                eye = XF.eye(bs, k=k, dtype=dtype)
                R2.append(vb(
                    lambda Xj, Yj, dXj, dYj, eye=eye: xf_add(
                        xf_add(xf_mul(eye, mu_c), -xf_matmul(Xj, Yj)),
                        -xf_matmul(dXj, dYj))
                )(Xs[l], Ys[l], dXs[l], dYs[l]))
            R2_all.append(R2)
        d_dirs, dy = directions(R2_all)

        # ---- step lengths (MPMP.jl:1829-1898): local min eig, pmin ----
        lam_p = jnp.inf
        lam_d = jnp.inf
        for bi, sh in enumerate(shapes):
            x_b, Xs, Ys = bstates[bi]
            dx, dXs, dYs = d_dirs[bi]
            valid = data[bi]["valid"]
            for l in range(sh.L):
                lp, okp = jax.vmap(
                    xf_min_eig_sym, in_axes=(1, 1), out_axes=(0, 0)
                )(Xs[l], dXs[l])
                ld, okd = jax.vmap(
                    xf_min_eig_sym, in_axes=(1, 1), out_axes=(0, 0)
                )(Ys[l], dYs[l])
                ok = ok & jnp.all(okp | (valid == 0)) & jnp.all(
                    okd | (valid == 0))
                lam_p = jnp.minimum(
                    lam_p, jnp.min(jnp.where(valid > 0, lp, jnp.inf)))
                lam_d = jnp.minimum(
                    lam_d, jnp.min(jnp.where(valid > 0, ld, jnp.inf)))
        lp = jax.lax.pmin(lam_p, "cluster")
        ld = jax.lax.pmin(lam_d, "cluster")

        def alpha_of(lam):
            return jnp.minimum(
                jnp.where(lam > -gamma, 1.0,
                          -gamma / jnp.minimum(lam, -1e-300)), 1.0)

        alpha_p = alpha_of(lp)
        alpha_d = alpha_of(ld)
        both = jnp.minimum(alpha_p, alpha_d)
        alpha_p = jnp.where(pd_feas, both, alpha_p)
        alpha_d = jnp.where(pd_feas, both, alpha_d)
        ap = XF.from_float(alpha_p.astype(dtype), k=k)
        ad = XF.from_float(alpha_d.astype(dtype), k=k)

        # ---- update + diagnostics ----
        new_bstates = []
        pobj_parts = []
        for bi, sh in enumerate(shapes):
            x_b, Xs, Ys = bstates[bi]
            dx, dXs, dYs = d_dirs[bi]
            valid = data[bi]["valid"]
            x_new = xf_add(x_b, xf_mul(dx, ap))
            Xn = tuple(xf_add(Xs[l], xf_mul(dXs[l], ap)) for l in range(sh.L))
            Yn = tuple(xf_add(Ys[l], xf_mul(dYs[l], ad)) for l in range(sh.L))
            new_bstates.append((x_new, Xn, Yn))
            pc = jax.vmap(
                lambda cj, xj: xf_sum(xf_mul(cj, xj).reshape((-1,)), axis=0),
                in_axes=1, out_axes=1,
            )(data[bi]["c"], x_new)
            pobj_parts.append(allsum(XF(pc.limbs * valid[None, :])))
        y_new = xf_add(y, xf_mul(dy, ad))
        p_obj = pobj_parts[0]
        for t in pobj_parts[1:]:
            p_obj = xf_add(p_obj, t)
        d_obj = xf_sum(xf_mul(b, y_new).reshape((-1,)), axis=0)
        if has_C:
            # dual objective <b,y> + <C,Y> + b0 (MPMP.jl:1030-1034)
            for bi, sh in enumerate(shapes):
                _, _, Yn = new_bstates[bi]
                valid = data[bi]["valid"]
                percl = None
                for l in range(sh.L):
                    dd = jax.vmap(
                        lambda Cj, Yj: xf_sum(
                            xf_mul(Cj, Yj).reshape((-1,)), axis=0),
                        in_axes=1, out_axes=1,
                    )(data[bi]["C"][l], Yn[l])
                    percl = dd if percl is None else xf_add(percl, dd)
                d_obj = xf_add(d_obj, allsum(XF(percl.limbs * valid[None, :])))
        if b0 is not None:
            p_obj = xf_add(p_obj, b0)
            d_obj = xf_add(d_obj, b0)
        ok_all = jax.lax.psum((~ok).astype(jnp.int32), "cluster") == 0
        ok_inv_all = jax.lax.psum((~ok_inv).astype(jnp.int32), "cluster") == 0
        ok_schur_all = (
            jax.lax.psum((~ok_schur).astype(jnp.int32), "cluster") == 0
        )

        # feasibility errors (MPMP.jl:1037-1062): max-abs over residuals.
        # P is masked to zero on padded clusters; d is exactly zero there
        # (B = c = 0); p is replicated.  hi-limb magnitudes suffice.
        P_err = jnp.asarray(0.0, dtype)
        d_err = jnp.asarray(0.0, dtype)
        for bi, sh in enumerate(shapes):
            for l in range(sh.L):
                P_err = jnp.maximum(
                    P_err, jnp.max(jnp.abs(bundle_ws[bi]["P"][l].limbs[0])))
            d_err = jnp.maximum(
                d_err, jnp.max(jnp.abs(bundle_ws[bi]["d"].limbs[0])))
        P_err = jax.lax.pmax(P_err, "cluster")
        d_err = jax.lax.pmax(d_err, "cluster")
        p_err = jnp.max(jnp.abs(p.limbs[0]))
        gap_num = jnp.abs(p_obj.limbs[0] - d_obj.limbs[0])
        gap_den = jnp.maximum(1.0, jnp.abs(p_obj.limbs[0] + d_obj.limbs[0]))
        diag = dict(
            mu=mu.to_float64(),
            p_obj=p_obj.to_float64(),
            d_obj=d_obj.to_float64(),
            gap=gap_num / gap_den,
            P_err=P_err,
            p_err=p_err,
            d_err=d_err,
            alpha_p=alpha_p,
            alpha_d=alpha_d,
            ok=ok_all & ok_inv_all & ok_schur_all,
            ok_inv=ok_inv_all,
            ok_schur=ok_schur_all,
        )
        return (tuple(new_bstates), y_new), diag

    # ---- sharding specs ----
    data_specs, state_spec = hetero_specs(shapes, has_C=has_C)
    rep = P()
    diag_spec = dict(mu=rep, p_obj=rep, d_obj=rep, gap=rep, P_err=rep,
                     p_err=rep, d_err=rep, alpha_p=rep, alpha_d=rep,
                     ok=rep, ok_inv=rep, ok_schur=rep)
    sharded = shard_map(
        step_spmd,
        mesh=mesh,
        in_specs=(data_specs, state_spec, rep),
        out_specs=(state_spec, diag_spec),
        check_vma=False,
    )
    return jax.jit(sharded)


def scatter_bundle_state(problem: SDPProblem, shapes, owners, state):
    """Scatter bundled (x, X, Y) + y back into the packed problem layout:
    x (total_dim_S, 1), block-diag X/Y lists, y (n_y, 1)."""
    info = problem.info
    k = problem.b.k
    bstates, y = state
    x_np = np.zeros((k, info.total_dim_S, 1), dtype=problem.b.dtype)
    X_bd: List[Any] = [None] * info.J
    Y_bd: List[Any] = [None] * info.J
    for bi, js in enumerate(owners):
        xb = np.asarray(bstates[bi][0].limbs)  # (k, J_pad, dim_S, 1)
        Xs = [np.asarray(Xl.limbs) for Xl in bstates[bi][1]]
        Ys = [np.asarray(Yl.limbs) for Yl in bstates[bi][2]]
        for slot, j in enumerate(js):
            x_np[:, info.x_indices[j]:info.x_indices[j + 1]] = xb[:, slot]
            X_bd[j] = [XF(jnp.asarray(Xs[l][:, slot]))
                       for l in range(len(Xs))]
            Y_bd[j] = [XF(jnp.asarray(Ys[l][:, slot]))
                       for l in range(len(Ys))]
    return XF(jnp.asarray(x_np)), X_bd, Y_bd, XF(np.asarray(y.limbs))


def solve_hetero_sharded(
    problem: SDPProblem,
    mesh: Mesh,
    maxiterations: int = 200,
    cfg=None,
    verbose: bool = False,
):
    """Convenience driver: bundle a packed problem, run the sharded step to
    convergence (host-checked each iteration), with the same degradation
    ladders as the core solver (sticky Cholesky->LU for X^-1 and for S/Q,
    MPMP.jl:762-801/1429-1441).  Returns a core-solver-compatible
    SolveResult (x, y untransformed to user coordinates).
    """
    import dataclasses
    import time as _time

    from clrs_tpu.core.solver import SolveResult, SolverConfig
    from clrs_tpu.ops.xfloat import xf_div

    cfg = cfg or SolverConfig()
    n_dev = mesh.devices.size
    shapes, data, owners = bundles_from_problem(problem, n_dev)
    k = problem.b.k
    dtype = problem.b.dtype
    has_C = problem.C_blocks is not None
    bstates, y = initial_bundle_state(
        shapes, cfg.omega_p, cfg.omega_d, k, dtype, problem.info.n_y)

    def build_step(c):
        return make_hetero_step(shapes, mesh, problem.b, c,
                                b0=problem.b0, has_C=has_C)

    step = build_step(cfg)
    data_specs, state_spec = hetero_specs(shapes, has_C=has_C)
    data = globalize(tuple(data), data_specs, mesh)
    state = globalize((bstates, y), state_spec, mesh)
    pd_feas = False
    it = 0
    gap = np.inf
    t0 = _time.time()
    # stall guard: at k limbs the reference's 1e-30 feasibility contract
    # may be beyond the precision floor, so keep the best iterate like the
    # core solver.  best diag/state start as None — only ever dereferenced
    # after at least one finite-merit iteration recorded them.
    best = (np.inf, None, None, None)  # (merit, state, diag, history row)
    stall = 0
    history: List[Dict[str, float]] = []
    converged = False
    status = "max_iterations"
    while it < maxiterations:
        it += 1
        prev_state = state
        state, diag = step(tuple(data), state, jnp.bool_(pd_feas))
        # sticky degradation ladders (rebuild the jitted step; retry the
        # same iteration from the pre-step state)
        if not bool(np.asarray(diag["ok_inv"])) and not cfg.use_lu_inverse:
            if verbose:
                print("X^-1 Cholesky failed — switching to LU inverse")
            cfg = dataclasses.replace(cfg, use_lu_inverse=True)
            step = build_step(cfg)
            state = prev_state
            it -= 1
            continue
        if not bool(np.asarray(diag["ok_schur"])) and not cfg.use_lu_schur:
            if verbose:
                print("Schur Cholesky failed — switching to LU for S and Q")
            cfg = dataclasses.replace(cfg, use_lu_schur=True)
            step = build_step(cfg)
            state = prev_state
            it -= 1
            continue
        po = float(np.asarray(diag["p_obj"]))
        do = float(np.asarray(diag["d_obj"]))
        gap = float(np.asarray(diag["gap"]))
        primal_err = max(float(np.asarray(diag["P_err"])),
                         float(np.asarray(diag["p_err"])))
        dual_err = float(np.asarray(diag["d_err"]))
        history.append(dict(
            iter=it, time=_time.time() - t0,
            mu=float(np.asarray(diag["mu"])), p_obj=po, d_obj=do, gap=gap,
            P_err=float(np.asarray(diag["P_err"])),
            p_err=float(np.asarray(diag["p_err"])), d_err=dual_err,
            alpha_p=float(np.asarray(diag["alpha_p"])),
            alpha_d=float(np.asarray(diag["alpha_d"])),
        ))
        # feasibility-locked steps once both residuals vanish
        # (the reference's terminate/pd_feas logic, MPMP.jl:1147-1173)
        pd_feas = (primal_err < cfg.primal_error_threshold
                   and dual_err < cfg.dual_error_threshold)
        merit = max(gap, primal_err, dual_err)
        if not np.isfinite(merit):
            merit = np.inf
        if merit < best[0]:
            # prev_state: this step's residual errors measure the
            # pre-update iterate (same off-by-one as the core drivers)
            best = (merit, prev_state, diag, history[-1])
            stall = 0
        else:
            stall += cfg.blowup_weight if merit > best[0] * cfg.blowup_factor else 1
        if verbose:
            print(f"iter {it}: mu={float(np.asarray(diag['mu'])):.3e} "
                  f"p={po:.12f} d={do:.12f} gap={gap:.2e} "
                  f"Perr={primal_err:.1e} derr={dual_err:.1e}")
        if pd_feas and gap < cfg.duality_gap_threshold:
            converged = True
            status = "optimal"
            break
        if stall >= cfg.stall_patience or not bool(np.asarray(diag["ok"])):
            status = ("stalled" if stall >= cfg.stall_patience
                      else "numerical_failure")
            if best[1] is not None:
                state, diag = best[1], best[2]
                gap = float(np.asarray(diag["gap"]))
            break

    row = None
    if status in ("stalled", "numerical_failure") and best[3] is not None:
        row = best[3]

    # scatter back to packed layout and untransform to user coordinates
    # (solver.py:1040-1046 analogue).  In a REAL multi-process run the
    # cluster-sharded leaves are not fully addressable per process, so
    # only the replicated y is materialized; the bundled sharded state is
    # attached as res.raw_state for continued distributed use.
    P_res, p_res, d_res = None, None, None
    if jax.process_count() == 1:
        x, X_bd, Y_bd, y_out = scatter_bundle_state(
            problem, shapes, owners, state)
        # residuals at the returned iterate in INTERNAL coordinates (the
        # SolveResult contract, solver.py SolveResult docstring) — computed
        # BEFORE the user-coordinate untransforms, via the generic trace
        from clrs_tpu.core.solver import compute_residuals as _cres

        P_res, p_res, d_res = _cres(problem, x, X_bd, y_out, None, Y=Y_bd)
        if status in ("stalled", "numerical_failure") and row is not None:
            # row's gap/objectives were evaluated POST-update; recompute at
            # the returned (pre-update) iterate so every SolveResult field
            # describes the same state as the residuals (ADVICE r3)
            from clrs_tpu.core.solver import (
                compute_dual_objective as _cdo,
                compute_duality_gap as _cdg,
                compute_primal_objective as _cpo,
            )

            b_po = _cpo(problem, x)
            b_do = _cdo(problem, y_out, Y_bd)
            gap = float(np.asarray(_cdg(b_po, b_do).limbs[0]))
            row = dict(
                row,
                gap=gap,
                p_obj=float(np.asarray(b_po.to_float64())),
                d_obj=float(np.asarray(b_do.to_float64())),
            )
        if problem.x_sigma is not None:
            x = xf_div(x, problem.x_sigma)
    else:
        x, X_bd, Y_bd = None, None, None
        y_out = XF(np.asarray(state[1].limbs))
    if problem.y_R_inv is not None:
        y_out = xf_matmul(problem.y_R_inv, y_out)
    if row is None:
        row = history[-1] if history else None
    res = SolveResult(
        x=x, X=X_bd, y=y_out, Y=Y_bd, P=P_res, p=p_res, d=d_res,
        dual_gap=gap,
        primal_objective=row["p_obj"] if row else float("nan"),
        dual_objective=row["d_obj"] if row else float("nan"),
        time_total=_time.time() - t0,
        iterations=it,
        converged=converged,
        status=status,
        history=history,
    )
    res.raw_state = state  # bundled sharded iterate (multi-process reuse)
    return res
