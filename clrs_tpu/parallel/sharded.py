"""Cluster-sharded IPM over a device mesh (the reference's thread-level
block parallelism, MPMP.jl:425-499 + §5.8, as SPMD over TPU chips).

Design (SURVEY.md §7): clusters are independent through the entire IPM
iteration except five small reductions —
  (a) p = b - sum_j B_j^T x_j            -> psum
  (b) Q = sum_j B_j^T S_j^-1 B_j         -> psum (n_y^2, rides ICI)
  (c) rhs of dy                           -> psum
  (d) dy broadcast back to clusters       -> replicated compute after psum
  (e) global min eigenvalue for alpha     -> pmin
  plus scalar dots (<X,Y>, objectives)    -> psum.

This module implements a *homogeneous-cluster* sharded step: J clusters of
identical shape signature (m, K, L, delta, rmax), stacked on a batch axis
and sharded over the mesh's "cluster" axis with shard_map; per-cluster
compute is the vmapped version of the core kernels.  Heterogeneous problems
are grouped into homogeneous bundles by BlockInfo signature (padding within
a bundle), with one shard_map per bundle — the general bucketing path lands
on top of this.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clrs_tpu.core.kernels import (
    compute_pairings,
    pairing_diag,
    schur_block_contribution,
    trace_A_from_diag,
    trace_A_generic,
    weighted_A_block,
)
from clrs_tpu.ops.linalg import (
    xf_cholesky,
    xf_min_eig_sym,
    xf_solve_tril,
    xf_solve_triu,
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
class HomogeneousShape:
    """Shape signature of one cluster bundle (all jit-static)."""

    J: int  # number of clusters in the bundle
    n_y: int
    m: int
    K: int  # samples per cluster
    delta: int  # basis length (single inner block L=1 for now)
    rmax: int

    @property
    def npairs(self) -> int:
        return self.m * (self.m + 1) // 2

    @property
    def dim_S(self) -> int:
        return self.npairs * self.K

    @property
    def bs(self) -> int:  # PSD block size
        return self.m * self.delta


def make_cluster_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("cluster",))


def random_homogeneous_problem(shape: HomogeneousShape, seed: int = 0, k: int = 2,
                               dtype=jnp.float64):
    """Synthetic well-posed problem data for tests/dryruns: random
    orthogonal-ish vectors, H=1, random B, c from a feasible dual point."""
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((shape.J, shape.delta, shape.K * shape.rmax))
    H = np.ones((shape.J, shape.K * shape.rmax))
    B = rng.standard_normal((shape.J, shape.dim_S, shape.n_y)) / shape.n_y
    # c chosen so the dual y=0, Y=I is strictly feasible:
    # c_(r,s,k) = Tr(A_(rsk) I) = sum_rnk H v^T v (r==s) or 0-ish; compute it
    c = np.zeros((shape.J, shape.dim_S))
    for j in range(shape.J):
        for r in range(shape.m):
            for s in range(r + 1):
                for kk in range(shape.K):
                    idx = (s + r * (r + 1) // 2) * shape.K + kk
                    if r == s:
                        acc = 0.0
                        for rnk in range(shape.rmax):
                            v = V[j, :, kk * shape.rmax + rnk]
                            acc += H[j, kk * shape.rmax + rnk] * v @ v
                        c[j, idx] = acc
    b = rng.standard_normal((shape.n_y, 1)) * 0.1
    to_xf = lambda a: XF.from_float(jnp.asarray(a, dtype=dtype), k=k)
    return dict(
        V=to_xf(V),
        H=to_xf(H),
        B=to_xf(B),
        c=to_xf(c[..., None]),
        b=to_xf(b),
    )


def initial_sharded_state(shape: HomogeneousShape, omega_p=100.0, omega_d=100.0,
                          k: int = 2, dtype=jnp.float64):
    x = XF.zeros((shape.J, shape.dim_S, 1), k=k, dtype=dtype)
    y = XF.zeros((shape.n_y, 1), k=k, dtype=dtype)
    eye = jnp.broadcast_to(jnp.eye(shape.bs, dtype=dtype), (shape.J, shape.bs, shape.bs))
    X = XF.from_float(eye * omega_p, k=k)
    Y = XF.from_float(eye * omega_d, k=k)
    return (x, y, X, Y)


def make_sharded_step(shape: HomogeneousShape, mesh: Mesh, cfg=None):
    """Build the cluster-sharded full IPM step (predictor + corrector).

    All per-cluster tensors are sharded over mesh axis "cluster" on their
    leading cluster dimension (limb axis 0 is replicated); y, dy, Q and
    scalars are replicated.  One call = one complete iteration.
    """
    from clrs_tpu.core.solver import SolverConfig

    cfg = cfg or SolverConfig()
    m, K, rmax = shape.m, shape.K, shape.rmax
    Ktot = shape.J * shape.bs
    beta_inf = cfg.beta_infeasible
    gamma = cfg.gamma

    # vmapped per-cluster kernels (batch axis 1 of the limb arrays)
    vb = partial(jax.vmap, in_axes=1, out_axes=1)

    def per_cluster_decomp(Xinv_j, Y_j, V_j, H_j, B_j):
        PX = compute_pairings(Xinv_j, V_j, m)
        PY = compute_pairings(Y_j, V_j, m)
        A_Y = pairing_diag(PY, m)
        S = xf_sym(schur_block_contribution(PX, PY, H_j, m, K, rmax))
        S_inv, ok = xf_spd_inverse(S)
        S_inv = xf_sym(S_inv)
        SB = xf_matmul(S_inv, B_j)
        Qpart = xf_matmul(B_j.T, SB)
        return S_inv, SB, Qpart, A_Y, ok

    def per_cluster_direction(P_j, RR_j, Xinv_j, Y_j, S_inv_j, d_j, V_j, H_j):
        Z = xf_sym(xf_matmul(Xinv_j, xf_add(xf_matmul(P_j, Y_j), -RR_j)))
        trZ = trace_A_generic(Z, V_j, H_j, m, K, rmax).reshape((shape.dim_S, 1))
        rhs_x_j = xf_add(-d_j, -trZ)
        tx = xf_matmul(S_inv_j, rhs_x_j)
        return rhs_x_j, tx

    def step_spmd(data, state, pd_feas):
        """Runs per device on its local cluster shard."""
        x, y, X, Y = state
        V, H, B, c, b = data["V"], data["H"], data["B"], data["c"], data["b"]

        def allsum_clusters(v: XF) -> XF:
            """Sum a per-cluster XF (leading value-axis = local clusters)
            over ALL clusters: all-gather the per-cluster partials (small:
            n_y^2 at most) and tree-sum in canonical cluster order.  Full
            XF precision and bitwise identical for any device count —
            a limb-wise psum would collapse the reduction to f64 accuracy.
            """
            gathered = jax.lax.all_gather(v.limbs, "cluster", axis=1, tiled=True)
            return xf_sum(XF(gathered), axis=0)

        # mu = <X, Y>/Ktot   (per-cluster dots, canonical tree sum)
        percl_dot = jax.vmap(
            lambda Xj, Yj: xf_sum(xf_mul(Xj, Yj).reshape((-1,)), axis=0),
            in_axes=1, out_axes=1,
        )(X, Y)
        mu = xf_div(allsum_clusters(percl_dot), float(Ktot))
        zero = XF.zeros((), k=mu.k, dtype=mu.dtype)
        mu_p = xf_where(pd_feas, zero, xf_mul(mu, beta_inf))

        # R = mu_p I - XY per cluster
        eye = XF.from_float(jnp.eye(shape.bs, dtype=X.dtype), k=X.k)
        def resid_R(X_j, Y_j, mu_s):
            return xf_add(xf_mul(eye, mu_s), -xf_matmul(X_j, Y_j))
        R = vb(lambda Xj, Yj: resid_R(Xj, Yj, mu_p))(X, Y)

        X_inv, ok_inv = jax.vmap(xf_spd_inverse, in_axes=1, out_axes=(1, 0))(X)
        X_inv = vb(xf_sym)(X_inv)
        ok = jnp.all(ok_inv)

        S_inv, SB, Qpart, A_Y, ok_s = jax.vmap(
            per_cluster_decomp, in_axes=(1, 1, 1, 1, 1), out_axes=(1, 1, 1, 1, 0)
        )(X_inv, Y, V, H, B)
        ok = ok & jnp.all(ok_s)
        Q = allsum_clusters(Qpart)  # the Q psum point, SURVEY.md §5.8 (b)
        Q_inv, ok_q = xf_spd_inverse(xf_sym(Q))
        ok = ok & ok_q

        # residuals
        P = vb(
            lambda a_j, V_j, H_j, X_j: xf_add(
                weighted_A_block(a_j[:, 0], V_j, H_j, m, K, rmax), -X_j
            )
        )(x, V, H, X)
        p = xf_add(
            b,
            -allsum_clusters(vb(lambda B_j, x_j: xf_matmul(B_j.T, x_j))(B, x)),
        )
        trY = jax.vmap(
            lambda A_Y_j, H_j: trace_A_from_diag(A_Y_j, H_j, m, K, rmax),
            in_axes=(1, 1), out_axes=1,
        )(A_Y, H)
        d = xf_add(
            xf_add(c, -XF(trY.limbs[..., None])),
            -vb(lambda B_j: xf_matmul(B_j, y))(B),
        )

        def directions(RR):
            rhs_x, tx = jax.vmap(
                per_cluster_direction, in_axes=(1, 1, 1, 1, 1, 1, 1, 1), out_axes=(1, 1)
            )(P, RR, X_inv, Y, S_inv, d, V, H)
            acc = allsum_clusters(
                vb(lambda B_j, t_j: xf_matmul(B_j.T, t_j))(B, tx)
            )
            dy = xf_matmul(Q_inv, xf_add(p, -acc))
            dx = vb(lambda t_j, SB_j: xf_add(t_j, xf_matmul(SB_j, dy)))(tx, SB)
            dX = vb(
                lambda dx_j, V_j, H_j, P_j: xf_add(
                    weighted_A_block(dx_j[:, 0], V_j, H_j, m, K, rmax), P_j
                )
            )(dx, V, H, P)
            dY = vb(
                lambda RR_j, dX_j, Y_j, Xi_j: xf_sym(
                    xf_matmul(Xi_j, xf_add(RR_j, -xf_matmul(dX_j, Y_j)))
                )
            )(RR, dX, Y, X_inv)
            return dx, dX, dy, dY

        dx, dX, dy, dY = directions(R)

        # corrector
        XdX = xf_add(X, dX)
        YdY = xf_add(Y, dY)
        percl_r = jax.vmap(
            lambda a, bb: xf_sum(xf_mul(a, bb).reshape((-1,)), axis=0),
            in_axes=1, out_axes=1,
        )(XdX, YdY)
        r = xf_div(allsum_clusters(percl_r), xf_mul(mu, float(Ktot)))
        one = XF.ones((), k=mu.k, dtype=mu.dtype)
        beta = xf_where(r < one, xf_mul(r, r), r)
        beta_c = xf_where(
            pd_feas,
            xf_where(beta < cfg.beta_feasible, XF.from_float(cfg.beta_feasible, k=mu.k, dtype=mu.dtype), xf_where(beta < one, beta, one)),
            xf_where(beta < beta_inf, XF.from_float(beta_inf, k=mu.k, dtype=mu.dtype), beta),
        )
        mu_c = xf_mul(beta_c, mu)
        R2 = vb(
            lambda Xj, Yj, dXj, dYj: xf_add(
                resid_R(Xj, Yj, mu_c), -xf_matmul(dXj, dYj)
            )
        )(X, Y, dX, dY)
        dx, dX, dy, dY = directions(R2)

        # step lengths: local min eig then pmin
        lam_p, okp = jax.vmap(xf_min_eig_sym, in_axes=(1, 1), out_axes=(0, 0))(X, dX)
        lam_d, okd = jax.vmap(xf_min_eig_sym, in_axes=(1, 1), out_axes=(0, 0))(Y, dY)
        ok = ok & jnp.all(okp) & jnp.all(okd)
        lp = jax.lax.pmin(jnp.min(lam_p), "cluster")
        ld = jax.lax.pmin(jnp.min(lam_d), "cluster")
        def alpha_of(lam):
            return jnp.minimum(
                jnp.where(lam > -gamma, 1.0, -gamma / jnp.minimum(lam, -1e-300)), 1.0
            )
        alpha_p = alpha_of(lp)
        alpha_d = alpha_of(ld)
        both = jnp.minimum(alpha_p, alpha_d)
        alpha_p = jnp.where(pd_feas, both, alpha_p)
        alpha_d = jnp.where(pd_feas, both, alpha_d)

        ap = XF.from_float(alpha_p.astype(X.dtype), k=X.k)
        ad = XF.from_float(alpha_d.astype(X.dtype), k=X.k)
        x_new = xf_add(x, xf_mul(dx, ap))
        y_new = xf_add(y, xf_mul(dy, ad))
        X_new = xf_add(X, xf_mul(dX, ap))
        Y_new = xf_add(Y, xf_mul(dY, ad))

        # diagnostics (gathered scalars)
        percl_cx = jax.vmap(
            lambda cj, xj: xf_sum(xf_mul(cj, xj).reshape((-1,)), axis=0),
            in_axes=1, out_axes=1,
        )(c, x_new)
        p_obj = allsum_clusters(percl_cx)
        d_obj = xf_sum(xf_mul(b, y_new).reshape((-1,)), axis=0)
        # replicate the global ok across devices
        ok_all = jax.lax.psum((~ok).astype(jnp.int32), "cluster") == 0
        diag = dict(
            mu=mu.to_float64(),
            p_obj=p_obj.to_float64(),
            d_obj=d_obj.to_float64(),
            alpha_p=alpha_p,
            alpha_d=alpha_d,
            ok=ok_all,
        )
        return (x_new, y_new, X_new, Y_new), diag

    # shardings: cluster-batched tensors split on their cluster axis
    # (limbs axis 1); replicated otherwise.
    clus = P(None, "cluster")
    rep = P()
    data_spec = dict(
        V=XF_spec(clus), H=XF_spec(clus), B=XF_spec(clus), c=XF_spec(clus),
        b=XF_spec(rep),
    )
    state_spec = (XF_spec(clus), XF_spec(rep), XF_spec(clus), XF_spec(clus))
    diag_spec = dict(mu=rep, p_obj=rep, d_obj=rep, alpha_p=rep, alpha_d=rep, ok=rep)

    sharded = shard_map(
        step_spmd,
        mesh=mesh,
        in_specs=(data_spec, state_spec, rep),
        out_specs=(state_spec, diag_spec),
        check_vma=False,
    )
    return jax.jit(sharded)


def XF_spec(spec: P) -> P:
    """PartitionSpec for an XF leaf: limb axis replicated + given spec."""
    return spec
