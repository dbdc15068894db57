"""Precision-escalation driver (SURVEY.md §3.5/§5.3).

The reference's universal recovery story is "restart the whole solve at
higher precision, possibly warm-started via initial_solutions"
(MPMP.jl:793, 1439, 1503, 1882 + :613-614) — but it leaves the restart to
the user.  Here it is automated as a two-stage ladder:

1. the DEVICE ladder: XLA limb rungs, warm-starting each rung from the
   previous iterate re-rounded to the new limb count.  Default (2, 3) on
   f64 backends (~106 -> ~159 bits; k >= 4 XLA:CPU compiles want opt
   level 0 and a subprocess, core/subproc.py) and (2, 4, 6, 8) on f32
   backends (TPU: each f32 limb carries 24 bits, so matching a given
   precision needs ~2x the limbs — "double-k").
2. the HOST ladder: the native high-precision path
   (core/host_solver.py over native/xfkern.cpp), default (6, 10) f64
   limbs (~318 -> ~530 bits; k=10 is the reference's 512-bit regime,
   MPMP.jl:17).  No XLA compile in the loop, so arbitrary k is cheap —
   this is the rung that lands the reference's full 1e-15/1e-30
   contract (BASELINE.md round-2 headline).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from clrs_tpu.core.blockinfo import BlockInfo
from clrs_tpu.core.problem import pack_constraints
from clrs_tpu.core.solver import SolveResult, solverank1sdp
from clrs_tpu.ops.xfloat import XF


def _reround_state(state, k: int, dtype=None, host: bool = False):
    """Pad/truncate the iterate's limb counts for the next rung.

    host=True keeps the limbs as NUMPY-backed HXF values: the host rungs
    must NEVER round-trip through jnp — on a TPU-backend process,
    jnp.asarray places f64 data in the TPU's non-IEEE f32-pair emulation,
    whose storage roundtrip re-rounds limb 0 and ZEROES the low limbs
    (CLAUDE.md), silently destroying the warm start (found round 3: the
    warm-started host rung failed its first Cholesky on a mangled X)."""

    def conv(x):
        limbs = np.asarray(x.limbs)
        if dtype is not None and limbs.dtype != dtype:
            # exact: every f32 limb is exactly representable in f64 (and a
            # canonical-overlap renormalization happens on first use)
            limbs = limbs.astype(dtype)
        if k > limbs.shape[0]:
            pad = np.zeros((k - limbs.shape[0],) + limbs.shape[1:], limbs.dtype)
            limbs = np.concatenate([limbs, pad], axis=0)
        else:
            limbs = limbs[:k]
        if host:
            from clrs_tpu.core.hostxf import HXF

            return HXF(limbs)
        return XF(jnp.asarray(limbs))

    x, y, X, Y = state
    return (
        conv(x),
        conv(y),
        [[conv(b) for b in row] for row in X],
        [[conv(b) for b in row] for row in Y],
    )


def default_device_ladder() -> Sequence[int]:
    """Platform-dependent default: double-k on f32 backends (TPU)."""
    import jax

    if jax.default_backend() == "tpu":
        return (2, 4, 6, 8)
    return (2, 3)


def solve_with_escalation(
    constraints,
    b,
    blockinfo: Optional[BlockInfo] = None,
    k_ladder: Optional[Sequence[int]] = None,
    host_ladder: Sequence[int] = (6, 10),
    C=None,
    b0=0,
    verbose: bool = True,
    isolate_slow_compiles: bool = True,
    subprocess_platform: str = "cpu",
    driver: str = "phase",
    **kwargs,
) -> SolveResult:
    """Solve, escalating the limb count on numerical failure or stall.

    Each rung repacks the exact host-side constraint data at the higher
    precision (no accumulation of low-precision rounding in the problem
    data) and warm-starts from the previous iterate.  After the device
    (XLA) ladder is exhausted, the HOST ladder (native k-limb kernels,
    f64 limbs) continues — unbounded precision with no compiler cost.

    driver: "phase" (phase-split jit, per-phase timings) or
    "device_loop" (lax.while_loop device-resident loop, one dispatch per
    chunk of iterations — the deployment shape).

    isolate_slow_compiles: device rungs whose limb count wants a
    different XLA backend optimization level than this process run in a
    fresh subprocess with the right flags, on `subprocess_platform`.
    """
    from clrs_tpu.core import subproc

    if k_ladder is None:
        k_ladder = default_device_ladder()

    state = ()
    res = None
    best = None
    rung_log = []  # per-rung summaries, attached to the result as .rungs

    def _finish(r):
        r.rungs = list(rung_log)
        return r

    def merit(r):
        if not r.history:
            return float("inf")
        return min(
            max(abs(h["gap"]), h["P_err"], h["p_err"], h["d_err"])
            for h in r.history
        )

    def consider(r):
        nonlocal best
        if best is None or merit(r) < merit(best):
            best = r

    remaining = kwargs.pop("maxiterations", 500)
    escalatable = True
    for rung, k in enumerate(k_ladder):
        t_rung = time.time()
        if verbose and rung > 0:
            print(f"[escalate] restarting at k={k} limbs (warm start)")
        if isolate_slow_compiles and subproc.needs_isolation(k):
            if verbose:
                print(
                    f"[escalate] k={k} wants "
                    f"{subproc.xla_flags_for_k(k)!r} — solving in a "
                    f"subprocess on {subprocess_platform}"
                )
            res = subproc.solve_in_subprocess(
                constraints,
                b,
                blockinfo,
                k,
                initial_solutions=state,
                C=C,
                b0=b0,
                platform=subprocess_platform,
                verbose=verbose,
                maxiterations=remaining,
                **kwargs,
            )
        elif driver == "device_loop":
            from clrs_tpu.core.device_loop import solve_on_device

            problem = pack_constraints(
                constraints, b, info=blockinfo, C=C, b0=b0, k=k
            )
            res = solve_on_device(
                problem,
                initial_solutions=state,
                verbose=verbose,
                maxiterations=remaining,
                **kwargs,
            )
        else:
            res = solverank1sdp(
                constraints,
                b,
                blockinfo,
                C=C,
                b0=b0,
                precision_k=k,
                initial_solutions=state,
                verbose=verbose,
                maxiterations=remaining,
                **kwargs,
            )
        rung_log.append(dict(
            path="device", k=k, iterations=res.iterations,
            status=res.status, wall=round(time.time() - t_rung, 2)))
        if res.converged:
            return _finish(res)
        consider(res)
        escalatable = (
            res.status.startswith(("numerical_failure", "overflow"))
            or res.status == "stalled"
        )
        if not escalatable:
            break  # max_iterations etc. — escalation will not help
        remaining = max(10, remaining - res.iterations)
        nxt = k_ladder[min(rung + 1, len(k_ladder) - 1)]
        state = _reround_state((res.x, res.y, res.X, res.Y), nxt)

    # host ladder: native high-precision rungs (f64 limbs always)
    if escalatable and host_ladder:
        from clrs_tpu.core.host_solver import solverank1sdp_host

        for k in host_ladder:
            t_rung = time.time()
            if verbose:
                print(
                    f"[escalate] restarting on the HOST path at k={k} f64 "
                    f"limbs (~{53 * k} bits, warm start)"
                )
            init = ()
            if res is not None and len(state) == 4:
                init = _reround_state(
                    (res.x, res.y, res.X, res.Y), k, dtype=np.float64,
                    host=True,
                )
            res = solverank1sdp_host(
                constraints,
                b,
                blockinfo,
                C=C,
                b0=b0,
                precision_k=k,
                initial_solutions=init,
                verbose=verbose,
                maxiterations=remaining,
                **kwargs,
            )
            rung_log.append(dict(
                path="host", k=k, iterations=res.iterations,
                status=res.status, wall=round(time.time() - t_rung, 2)))
            if res.converged:
                return _finish(res)
            consider(res)
            if not (
                res.status.startswith("numerical_failure")
                or res.status == "stalled"
            ):
                break
            remaining = max(10, remaining - res.iterations)
    return _finish(best if best is not None else res)
