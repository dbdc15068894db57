"""Reproduce + diagnose the sphere-packing 2d=16 k=4 Schur factorization
failure (TODO item 1): run the IPM loop manually with non-finite scans and
dump the failing state to /tmp/sp16_fail.pkl for post-mortem.

Usage: python scripts/debug_sp16.py [k] [maxiter]
"""
import os
import pickle
import sys
import time

k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
maxiter = int(sys.argv[2]) if len(sys.argv) > 2 else 250

import numpy as np
import mpmath
import jax

# run on CPU: the axon TPU plugin force-registers itself and overrides
# JAX_PLATFORMS, so it must be disabled via config (same as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

import clrs_tpu  # noqa: F401  (sets XLA flags)
from clrs_tpu.apps.sphere_packing import nsphere_packing_2point
from clrs_tpu.core.problem import pack_constraints
from clrs_tpu.core.solver import (
    SolverConfig, make_ipm_phases, initial_state,
)
from clrs_tpu.ops.xfloat import XF

print(f"jax backend: {jax.default_backend()}, k={k}", flush=True)

# Build the problem (known-answer config, examples/SpherePacking.jl:116-129)
mpmath.mp.prec = 512
r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]
t0 = time.time()
_, _, (constraints, b, blockinfo) = nsphere_packing_2point(
    3, 8, r, 2, return_problem=True, maxiterations=1, verbose=False,
    stall_patience=1,
)
print(f"problem built in {time.time()-t0:.1f}s", flush=True)

problem = pack_constraints(constraints, b, info=blockinfo, k=k)
cfg = SolverConfig(verbose=True, stall_patience=100, maxiterations=maxiter,
                   omega_p=100.0, omega_d=100.0)
info = problem.info


def finite_bd(bd):
    bad = []
    for j, row in enumerate(bd):
        for l, blk in enumerate(row):
            if not bool(jnp.all(jnp.isfinite(blk.limbs))):
                bad.append((j, l))
    return bad


def stats_xf(x: XF):
    a = np.asarray(x.limbs[0])
    fin = np.isfinite(a)
    return dict(
        max=float(np.max(np.abs(a[fin]))) if fin.any() else None,
        nan=int(np.isnan(a).sum()), inf=int(np.isinf(a).sum()),
    )


phases = make_ipm_phases(problem, cfg)
state = initial_state(problem, cfg)
pd_feas = False
use_lu_schur = False
use_lu_inverse = False

for itn in range(1, maxiter + 1):
    pd = jnp.bool_(pd_feas)
    mu, R, X_inv, ok_inv = phases["mu_R_Xinv"](problem, state, pd)
    if not bool(np.asarray(ok_inv)):
        if not use_lu_inverse:
            print(f"[{itn}] X^-1 Cholesky failed -> LU", flush=True)
            use_lu_inverse = True
            import dataclasses
            cfg = dataclasses.replace(cfg, use_lu_inverse=True)
            phases = make_ipm_phases(problem, cfg)
            continue
        print(f"[{itn}] X^-1 LU failed — dumping", flush=True)
        break
    decomp = phases["decomp"](problem, X_inv, state[3])
    if not bool(np.asarray(decomp["ok"])):
        if not use_lu_schur:
            print(f"[{itn}] Schur Cholesky failed -> LU", flush=True)
            use_lu_schur = True
            import dataclasses
            cfg = dataclasses.replace(cfg, use_lu_schur=True)
            phases = make_ipm_phases(problem, cfg)
            continue
        print(f"[{itn}] SCHUR FACTORIZATION FAILED (LU) — diagnostics:", flush=True)
        print("  X_inv nonfinite blocks:", finite_bd(X_inv))
        print("  Y nonfinite blocks:", finite_bd(state[3]))
        for j in range(info.J):
            S = decomp["S_mat"][j]
            st = stats_xf(S)
            Sf = np.asarray(S.to_float64())
            try:
                ev = np.linalg.eigvalsh(Sf)
                evs = f"eig[min,max]=({ev[0]:.3e},{ev[-1]:.3e})"
            except Exception as e:
                evs = f"eig failed: {e}"
            print(f"  S[{j}] dim={S.shape} {st} {evs}", flush=True)
            # limb magnitudes
            for li in range(S.k):
                lm = np.asarray(S.limbs[li])
                finm = np.isfinite(lm)
                print(f"    limb{li}: maxabs={np.max(np.abs(lm[finm])) if finm.any() else 'NA':.3e} "
                      f"nan={int(np.isnan(lm).sum())} inf={int(np.isinf(lm).sum())}")
        Q = decomp.get("Q_inv")
        print("  Q_inv:", stats_xf(Q))
        with open("/tmp/sp16_fail.pkl", "wb") as f:
            pickle.dump(dict(
                state=jax.tree.map(np.asarray, state),
                X_inv=jax.tree.map(np.asarray, X_inv),
                S_mat=jax.tree.map(np.asarray, decomp["S_mat"]),
                mu=np.asarray(mu.limbs),
                k=k, itn=itn,
            ), f)
        print("dumped /tmp/sp16_fail.pkl", flush=True)
        break
    P, p, d = phases["residuals"](problem, state[0], state[2], state[1], decomp["A_Y"])
    dx, dX, dy, dY = phases["direction"](problem, P, p, d, R, X_inv, state[3], decomp)
    beta_c, R2 = phases["corrector_R"](state[2], state[3], dX, dY, mu, pd)
    dx, dX, dy, dY = phases["direction"](problem, P, p, d, R2, X_inv, state[3], decomp)
    alpha_p, ok_p = phases["steplength"](state[2], dX)
    alpha_d, ok_d = phases["steplength"](state[3], dY)
    if not (bool(np.asarray(ok_p)) and bool(np.asarray(ok_d))):
        print(f"[{itn}] steplength failed", flush=True)
        break
    state, diag = phases["update"](
        problem, state, dx, dy, dX, dY, alpha_p, alpha_d, pd, P, p, d, mu, beta_c
    )
    diag = {kk: np.asarray(v) for kk, v in diag.items()}
    gap = float(diag["gap_hi"])
    print(f"{itn:4d} mu={float(diag['mu']):.3e} gap={gap:.3e} "
          f"P={float(diag['P_err']):.2e} p={float(diag['p_err']):.2e} "
          f"d={float(diag['d_err']):.2e} ap={float(diag['alpha_p']):.2e} "
          f"ad={float(diag['alpha_d']):.2e} dobj={float(diag['d_obj']):.12f}",
          flush=True)
    # save rolling last-good state for post-mortem
    if itn % 10 == 0 or itn > 60:
        with open("/tmp/sp16_last.pkl", "wb") as f:
            pickle.dump(dict(state=jax.tree.map(np.asarray, state), itn=itn, k=k), f)
    primal_feas = float(diag["primal_err_hi"]) < cfg.primal_error_threshold
    dual_feas = float(diag["dual_err_hi"]) < cfg.dual_error_threshold
    pd_feas = primal_feas and dual_feas
    if primal_feas and dual_feas and gap < cfg.duality_gap_threshold:
        print("CONVERGED", flush=True)
        break
print("done", flush=True)
