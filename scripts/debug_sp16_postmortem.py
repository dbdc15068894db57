"""Post-mortem of the sphere-packing 2d=16 k=4 Schur failure: rebuild the
problem, load the failing state from /tmp/sp16_fail.pkl, and re-run the
decomposition piece by piece to locate the first non-finite value."""
import pickle
import sys
import time

import numpy as np
import mpmath
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import clrs_tpu  # noqa: F401
from clrs_tpu.apps.sphere_packing import nsphere_packing_2point
from clrs_tpu.core.problem import pack_constraints
from clrs_tpu.core.kernels import compute_pairings, schur_block_contribution
from clrs_tpu.ops.linalg import xf_lu, xf_lu_solve, xf_sym, xf_spd_inverse
from clrs_tpu.ops.xfloat import XF, xf_matmul, xf_add

k = 4
mpmath.mp.prec = 512
r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]
t0 = time.time()
_, _, (constraints, b, blockinfo) = nsphere_packing_2point(
    3, 8, r, 2, return_problem=True, maxiterations=1, verbose=False,
    stall_patience=1,
)
problem = pack_constraints(constraints, b, info=blockinfo, k=k)
print(f"problem built in {time.time()-t0:.1f}s", flush=True)
info = problem.info

with open("/tmp/sp16_fail.pkl", "rb") as f:
    D = pickle.load(f)
state = jax.tree.map(jnp.asarray, D["state"])
X_inv = jax.tree.map(jnp.asarray, D["X_inv"])
x, y, X, Y = state


def stats(name, xf):
    a = np.asarray(xf.limbs[0])
    fin = np.isfinite(a)
    print(f"  {name}: max={np.max(np.abs(a[fin])) if fin.any() else float('nan'):.3e} "
          f"nan={int(np.isnan(a).sum())} inf={int(np.isinf(a).sum())}", flush=True)


Q = XF.zeros((info.n_y, info.n_y), k=k, dtype=jnp.float64)
for j in range(info.J):
    cl = problem.clusters[j]
    m, K = info.m[j], info.n_samples[j]
    S_j = XF.zeros((info.dim_S[j], info.dim_S[j]), k=k, dtype=jnp.float64)
    for l in range(info.L[j]):
        PX = compute_pairings(X_inv[j][l], cl.Vs[l], m)
        PY = compute_pairings(Y[j][l], cl.Vs[l], m)
        S_j = xf_add(S_j, schur_block_contribution(PX, PY, cl.Hs[l], m, K, info.rmax[j][l]))
    S_j = xf_sym(S_j)
    print(f"cluster {j}:", flush=True)
    stats("S", S_j)
    lu, perm, ok = jax.jit(xf_lu)(S_j)
    print(f"  LU ok={bool(np.asarray(ok))}", flush=True)
    stats("LU", XF(lu.limbs))
    diagU = np.asarray(lu.limbs[0]).diagonal()
    print(f"  U diag min|.|={np.min(np.abs(diagU)):.3e} max={np.max(np.abs(diagU)):.3e}")
    Si = jax.jit(xf_lu_solve)(lu, perm, XF.eye(S_j.shape[0], k=k, dtype=jnp.float64))
    stats("S_inv", Si)
    SB = xf_matmul(Si, cl.B)
    stats("S_inv_B", SB)
    Qp = xf_matmul(cl.B.T, SB)
    stats("Qp", Qp)
    Q = xf_add(Q, Qp)

stats("Q", Q)
luQ, permQ, okQ = jax.jit(xf_lu)(xf_sym(Q))
print(f"Q LU ok={bool(np.asarray(okQ))}", flush=True)
stats("LU(Q)", XF(luQ.limbs))
Qi = jax.jit(xf_lu_solve)(luQ, permQ, XF.eye(info.n_y, k=k, dtype=jnp.float64))
stats("Q_inv", Qi)
print("done", flush=True)
