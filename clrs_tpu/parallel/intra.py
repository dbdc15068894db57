"""Intra-cluster (single-huge-cluster) chip sharding via GSPMD.

parallel/sharded.py and parallel/hetero.py shard the *cluster* axis —
embarrassingly parallel, the TPU analogue of the reference's threaded
per-(j,l) loops (MPMP.jl:492-499).  This module covers the opposite
regime, SURVEY.md §5.7: ONE huge cluster (high polynomial degree, large
delta and T = n_samples * rmax) that must be split *inside* — what the
reference handles with intra-kernel column chunking over shared-memory
threads (MPMP.jl:1230-1243, 1274) and cannot scale past one process.

TPU-native design: lay out the big tensors over mesh axis "chip" with
NamedSharding — the sample-rank axis T of V/H (the wide axis of the
pairing products), the tuple axis of B/c/x, and the row axis of the PSD
blocks — and run the UNMODIFIED fused IPM step (core/solver.py) under
jit.  XLA's SPMD partitioner inserts the collectives.  This is safe for
extended-precision arithmetic by construction: every XF reduction is an
explicit tree of error-free two_sum/two_prod sequences guarded by
optimization barriers (ops/xfloat.py), so the partitioner can only move
data (all-gather/reshard), never reassociate a sum — sharded and
unsharded runs agree to the last limb (asserted in tests).

Divisibility: jax.Array shardings need the sharded dim to divide the
mesh.  T = K * rmax is made divisible at pack time by padding the rank
axis (`pad_info_ranks`) — extra vector slots with H = 0 contribute
exact zeros to every pairing/trace/weighted-sum formula (same invariant
as the ragged-rank padding, core/blockinfo.py docstring), so padded and
unpadded problems produce identical iterates.  Dims that still do not
divide (small n_y, odd dim_S) are simply replicated.
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clrs_tpu.core.blockinfo import BlockInfo
from clrs_tpu.core.problem import ClusterData, SDPProblem
from clrs_tpu.ops.xfloat import XF


def pad_info_ranks(info: BlockInfo, multiple: int) -> BlockInfo:
    """Pad every rmax[j][l] up so that T = n_samples * rmax is a multiple
    of `multiple`.  Pass the result as `info=` to pack_constraints: the
    extra slots get V = 0, H = 0 (exact no-ops)."""
    rmax = []
    for j in range(info.J):
        K = info.n_samples[j]
        step = multiple // math.gcd(K, multiple)
        rmax.append(tuple(-(-r // step) * step for r in info.rmax[j]))
    return replace(info, rmax=tuple(rmax))


def make_chip_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("chip",))


def _put(x: Optional[XF], mesh: Mesh, spec: Tuple) -> Optional[XF]:
    """device_put one XF leaf; value-dim spec (limb axis is always
    replicated).  Falls back to replication when a named dim does not
    divide the mesh."""
    if x is None:
        return None
    n = mesh.devices.size
    safe = tuple(
        s if (s is None or x.shape[i] % n == 0) else None
        for i, s in enumerate(spec)
    )
    sh = NamedSharding(mesh, P(None, *safe))
    return XF(jax.device_put(x.limbs, sh))


def shard_problem(
    problem: SDPProblem, mesh: Mesh, axis: str = "chip"
) -> SDPProblem:
    """Place a packed problem over the mesh: V/H sharded on the T axis,
    B/c on the tuple axis; small objective-side data replicated."""
    a = axis
    clusters = []
    for c in problem.clusters:
        clusters.append(
            ClusterData(
                Vs=tuple(_put(V, mesh, (None, a)) for V in c.Vs),
                Hs=tuple(_put(H, mesh, (a,)) for H in c.Hs),
                B=_put(c.B, mesh, (a, None)),
                c=_put(c.c, mesh, (a, None)),
            )
        )
    C_blocks = problem.C_blocks
    if C_blocks is not None:
        C_blocks = [
            [_put(Cb, mesh, (a, None)) for Cb in Cj] for Cj in C_blocks
        ]
    return SDPProblem(
        clusters=tuple(clusters),
        b=_put(problem.b, mesh, (None, None)),
        C_blocks=C_blocks,
        b0=_put(problem.b0, mesh, ()),
        info=problem.info,
        x_sigma=_put(problem.x_sigma, mesh, (None, None)),
        y_R_inv=_put(problem.y_R_inv, mesh, (None, None)),
        y_R=_put(problem.y_R, mesh, (None, None)),
    )


def shard_state(state, mesh: Mesh, axis: str = "chip"):
    """Place an IPM state (x, y, X, Y): PSD block rows and the x tuple
    axis over the mesh; y replicated (it feeds the serial Q solve)."""
    x, y, X, Y = state
    a = axis
    x = _put(x, mesh, (a, None))
    y = _put(y, mesh, (None, None))
    X = [[_put(Xb, mesh, (a, None)) for Xb in Xj] for Xj in X]
    Y = [[_put(Yb, mesh, (a, None)) for Yb in Yj] for Yj in Y]
    return x, y, X, Y


def solve_intra_sharded(
    problem: SDPProblem,
    mesh: Mesh,
    maxiterations: int = 200,
    cfg=None,
    verbose: bool = False,
):
    """Driver: place the problem/state over the mesh, run the fused step
    (host-checked convergence each iteration).  Returns (state, out)
    like parallel.hetero.solve_hetero_sharded."""
    import jax.numpy as jnp

    from clrs_tpu.core.solver import SolverConfig, initial_state, make_fused_step

    cfg = cfg or SolverConfig()
    sp = shard_problem(problem, mesh)
    state = shard_state(initial_state(problem, cfg), mesh)
    step = make_fused_step(problem, cfg)
    pd_feas = False
    gap = np.inf
    it = 0
    best = (np.inf, None, None)  # (merit, state, diag); only dereferenced
    # after a finite-merit iteration recorded them
    stall = 0
    diag = None
    for it in range(1, maxiterations + 1):
        state, diag = step(sp, state, jnp.bool_(pd_feas))
        gap = float(np.asarray(diag["gap"]))
        primal_err = float(np.asarray(diag["primal_err_hi"]))
        dual_err = float(np.asarray(diag["dual_err_hi"]))
        pd_feas = (
            primal_err < cfg.primal_error_threshold
            and dual_err < cfg.dual_error_threshold
        )
        merit = max(gap, primal_err, dual_err)
        if not np.isfinite(merit):
            merit = np.inf
        if merit < best[0]:
            best = (merit, state, diag)
            stall = 0
        else:
            stall += 1
        if verbose:
            print(
                f"iter {it}: mu={float(np.asarray(diag['mu'])):.3e} "
                f"p={float(np.asarray(diag['p_obj'])):.12f} "
                f"d={float(np.asarray(diag['d_obj'])):.12f} gap={gap:.2e}"
            )
        if pd_feas and gap < cfg.duality_gap_threshold:
            break
        if stall >= cfg.stall_patience or not bool(np.asarray(diag["ok"])):
            if best[1] is not None:
                state, diag = best[1], best[2]
                gap = float(np.asarray(diag["gap"]))
            break
    return state, dict(gap=gap, iterations=it, diag=diag)


# ---------------------------------------------------------------------------
# Panel-parallel blocked Cholesky (SURVEY.md §5.7's "blocked right-looking
# factorization with panel broadcasts") now lives in ops/linalg.py, where
# ops/linalg.xf_cholesky dispatches to it for large blocks (VERDICT r4
# item 5) — re-exported here for the mesh-facing API and existing callers.
# ---------------------------------------------------------------------------

from clrs_tpu.ops.linalg import xf_cholesky_panel  # noqa: E402, F401
