"""Precision-escalation driver (SURVEY.md §3.5/§5.3).

The reference's universal recovery story is "restart the whole solve at
higher precision, possibly warm-started via initial_solutions"
(MPMP.jl:793, 1439, 1503, 1882 + :613-614) — but it leaves the restart to
the user.  Here it is automated as a two-stage ladder:

1. the DEVICE ladder: XLA limb rungs, warm-starting each rung from the
   previous iterate re-rounded to the new limb count.  Default (2, 3) on
   f64 backends (~106 -> ~159 bits; k >= 4 XLA:CPU compiles want opt
   level 0 and a subprocess, core/subproc.py) and
   (2, 4, 6, (10, 24), (14, 24)) on f32 backends (TPU: each f32 limb
   carries 24 bits — "double-k"; beyond k~6 plain f32 expansions hit the
   exponent floor, so the high rungs run SCALED expansions (k, S) at
   S=24 scale bits, reaching ~240/336 bits on-chip).
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


def _reround_state(state, k: int, dtype=None, host: bool = False,
                   from_scale: int = 0, to_scale: int = 0):
    """Pad/truncate the iterate's limb counts for the next rung.

    host=True keeps the limbs as NUMPY-backed HXF values: the host rungs
    must NEVER round-trip through jnp — on a TPU-backend process,
    jnp.asarray places f64 data in the TPU's non-IEEE f32-pair emulation,
    whose storage roundtrip re-rounds limb 0 and ZEROES the low limbs
    (CLAUDE.md), silently destroying the warm start (found round 3: the
    warm-started host rung failed its first Cholesky on a mangled X).

    from_scale/to_scale: the SCALED-expansion representation of the
    source/target rung (ops/xfloat.py scaled_mode): stored limb i is the
    true limb times 2^(scale*i).  Crossing representations multiplies
    limb i by the exact power 2^((to-from)*i) in f64 (up to 2^±312 at
    k=14/S=24 — in f64 range; the power-of-two scaling is exact, the
    final cast to an f32 target rounds once)."""

    def conv(x):
        limbs = np.asarray(x.limbs)
        kf = limbs.shape[0]
        target_dtype = np.dtype(dtype) if dtype is not None else limbs.dtype
        if from_scale != to_scale:
            sh = np.ldexp(
                np.ones(kf),
                (to_scale - from_scale) * np.arange(kf),
            ).reshape((kf,) + (1,) * (limbs.ndim - 1))
            limbs = limbs.astype(np.float64) * sh
        if limbs.dtype != target_dtype:
            # f32 -> f64 is exact (canonical-overlap renorm happens on
            # first use); f64 -> f32 rounds the warm start once
            limbs = limbs.astype(target_dtype)
        if k > kf:
            pad = np.zeros((k - kf,) + limbs.shape[1:], limbs.dtype)
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


def _norm_rung(rung):
    """A ladder entry is an int k (plain expansions) or a (k, scale_bits)
    tuple (SCALED f32 expansions, ops/xfloat.py scaled_mode — the
    representation that lifts the f32 exponent floor for k > ~6)."""
    if isinstance(rung, (tuple, list)):
        k, sb = rung
        return int(k), int(sb)
    return int(rung), 0


def default_device_ladder() -> Sequence:
    """Platform-dependent default: double-k on f32 backends (TPU), then
    the scaled-f32 contract rung (k=14 ~ 336 bits, the regime where the
    full reference contract lands — BASELINE.md round-4).

    CLRS_ESCALATE_512=1 appends a (22, 24) rung: 22 scaled f32 limbs =
    528 bits, true setprecision(512) parity with the reference's own
    default regime (/root/reference/MPMP.jl:17) rather than the 336-bit
    proxy.  Flag-gated: the k=22 compile budget is only worth paying
    when the k=14 rung's ~336 bits demonstrably fall short."""
    import os

    import jax

    if jax.default_backend() == "tpu":
        ladder = (2, 4, 6, (10, 24), (14, 24))
        if os.environ.get("CLRS_ESCALATE_512", "") == "1":
            ladder = ladder + ((22, 24),)
        return ladder
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
    last_sb = 0  # scale_bits of the rung that produced `res`
    for rung, entry in enumerate(k_ladder):
        k, sb = _norm_rung(entry)
        t_rung = time.time()
        if verbose and rung > 0:
            tag = f" scaled S={sb}" if sb else ""
            print(f"[escalate] restarting at k={k} limbs{tag} (warm start)")
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
                scale_bits=sb,
                **kwargs,
            )
        elif driver == "device_loop":
            from clrs_tpu.core.device_loop import solve_on_device

            problem = pack_constraints(
                constraints, b, info=blockinfo, C=C, b0=b0, k=k,
                scale_bits=sb,
            )
            res = solve_on_device(
                problem,
                initial_solutions=state,
                verbose=verbose,
                maxiterations=remaining,
                scale_bits=sb,
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
                scale_bits=sb,
                **kwargs,
            )
        last_sb = sb
        rung_log.append(dict(
            path="device", k=k, scale_bits=sb, iterations=res.iterations,
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
        nk, nsb = _norm_rung(k_ladder[min(rung + 1, len(k_ladder) - 1)])
        state = _reround_state(
            (res.x, res.y, res.X, res.Y), nk, from_scale=sb, to_scale=nsb,
        )

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
                # host rungs store PLAIN f64 limbs: de-scale if the last
                # device rung ran in scaled representation
                init = _reround_state(
                    (res.x, res.y, res.X, res.Y), k, dtype=np.float64,
                    host=True, from_scale=last_sb, to_scale=0,
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
