"""Precision-escalation driver (SURVEY.md §3.5/§5.3).

The reference's universal recovery story is "restart the whole solve at
higher precision, possibly warm-started via initial_solutions"
(MPMP.jl:793, 1439, 1503, 1882 + :613-614) — but it leaves the restart to
the user.  Here it is automated: the limb ladder k = 2 -> 3 -> 4
(~106 -> ~159 -> ~212 bits) is climbed on numerical failure or stall,
warm-starting each rung from the previous iterate re-rounded to the new
limb count.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from clrs_tpu.core.blockinfo import BlockInfo
from clrs_tpu.core.problem import pack_constraints
from clrs_tpu.core.solver import SolveResult, solverank1sdp
from clrs_tpu.ops.xfloat import XF


def _reround_state(state, k: int):
    def conv(x: XF) -> XF:
        limbs = np.asarray(x.limbs)
        if k > limbs.shape[0]:
            pad = np.zeros((k - limbs.shape[0],) + limbs.shape[1:], limbs.dtype)
            limbs = np.concatenate([limbs, pad], axis=0)
        else:
            limbs = limbs[:k]
        return XF(jnp.asarray(limbs))

    x, y, X, Y = state
    return (
        conv(x),
        conv(y),
        [[conv(b) for b in row] for row in X],
        [[conv(b) for b in row] for row in Y],
    )


def solve_with_escalation(
    constraints,
    b,
    blockinfo: Optional[BlockInfo] = None,
    k_ladder: Sequence[int] = (2, 3),
    C=None,
    b0=0,
    verbose: bool = True,
    isolate_slow_compiles: bool = True,
    subprocess_platform: str = "cpu",
    **kwargs,
) -> SolveResult:
    """Solve, escalating the limb count on numerical failure.

    Each rung repacks the exact host-side constraint data at the higher
    precision (no accumulation of low-precision rounding in the problem
    data) and warm-starts from the previous iterate.

    isolate_slow_compiles: rungs whose limb count wants a different XLA
    backend optimization level than this process (k >= 4 needs level 0
    or single-phase compiles take hours; see core/subproc.py) run in a
    fresh subprocess with the right flags, on `subprocess_platform`.
    """
    from clrs_tpu.core import subproc

    state = ()
    res = None
    best = None

    def merit(r):
        if not r.history:
            return float("inf")
        return min(
            max(abs(h["gap"]), h["P_err"], h["p_err"], h["d_err"])
            for h in r.history
        )

    remaining = kwargs.pop("maxiterations", 500)
    for rung, k in enumerate(k_ladder):
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
        if res.converged:
            return res
        if best is None or merit(res) < merit(best):
            best = res
        escalatable = res.status.startswith("numerical_failure") or res.status == "stalled"
        if not escalatable:
            break  # max_iterations etc. — escalation will not help
        remaining = max(10, remaining - res.iterations)
        state = _reround_state((res.x, res.y, res.X, res.Y), k_ladder[min(rung + 1, len(k_ladder) - 1)])
    return best if best is not None else res
