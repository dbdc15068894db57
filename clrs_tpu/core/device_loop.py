"""Device-resident IPM solve: the whole iteration *loop* on device.

The phase-split driver (core/solver.py) dispatches ~8 device calls per
iteration and reads diagnostics back after each — the right shape for
debugging and per-phase timings, but on a dispatch-latency-heavy path (a
remote TPU behind a relay, or many tiny clusters) the host round-trips
dominate.  Here the loop itself is a `lax.while_loop`: the device runs
iterations back-to-back, checks convergence/failure/stall *on device*, and
returns control to the host only every `chunk` iterations (for the
iteration log) or on a terminal condition.

This is the TPU-native deployment shape of the reference's `while
!terminate` host loop (MPMP.jl:742-954): where the reference pays a
Julia->C call per Arb op, this pays one dispatch per `chunk` iterations.

Status codes (device-side `terminate` re-derivation, MPMP.jl:1147-1173 +
the degradation ladder §3.5):
  0 RUNNING          chunk exhausted, keep going
  1 OPTIMAL          gap + both feasibility thresholds met
  2 NUMERICAL_FAIL   a factorization failed at this precision
  3 STALLED          no merit improvement for `stall_patience` iterations
  4 PRIMAL_FEASIBLE  need_primal_feasible short-circuit
  5 DUAL_FEASIBLE    need_dual_feasible short-circuit
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from clrs_tpu.core.solver import (
    SolveResult,
    SolverConfig,
    initial_state,
    make_ipm_phases,
)

RUNNING, OPTIMAL, NUMERICAL_FAIL, STALLED, PRIMAL_FEASIBLE, DUAL_FEASIBLE = range(6)

_STATUS_NAMES = {
    OPTIMAL: "optimal",
    NUMERICAL_FAIL: "numerical_failure:device_loop",
    STALLED: "stalled",
    PRIMAL_FEASIBLE: "primal_feasible",
    DUAL_FEASIBLE: "dual_feasible",
}


def _tree_where(cond, a, b):
    return jax.tree.map(lambda x, y: jnp.where(cond, x, y), a, b)


def make_device_solve(problem, cfg: SolverConfig):
    """Build the jitted chunk runner.

    Returns fn(problem, carry, itn_stop) -> carry, where carry =
    (state, pd_feas, itn, status, best_state, best_merit, stall, diag).
    The returned function executes while_loop iterations until a terminal
    status or itn == itn_stop.
    """
    phases = make_ipm_phases(problem, cfg)

    def one_iter(problem, state, pd):
        mu, R, X_inv, ok_inv = phases["mu_R_Xinv"](problem, state, pd)
        decomp = phases["decomp"](problem, X_inv, state[3])
        P, p, d = phases["residuals"](
            problem, state[0], state[2], state[1], decomp["A_Y"]
        )
        dx, dX, dy, dY = phases["direction"](
            problem, P, p, d, R, X_inv, state[3], decomp
        )
        beta_c, R2 = phases["corrector_R"](state[2], state[3], dX, dY, mu, pd)
        dx, dX, dy, dY = phases["direction"](
            problem, P, p, d, R2, X_inv, state[3], decomp
        )
        alpha_p, ok_p = phases["steplength"](state[2], dX)
        alpha_d, ok_d = phases["steplength"](state[3], dY)
        new_state, diag = phases["update"](
            problem, state, dx, dy, dX, dY, alpha_p, alpha_d, pd, P, p, d,
            mu, beta_c,
        )
        diag["ok"] = ok_inv & decomp["ok"] & ok_p & ok_d
        return new_state, diag

    def body(carry, problem):
        state, pd, itn, status, best, best_merit, stall, _, best_diag = carry
        new_state, diag = one_iter(problem, state, pd)
        ok = diag["ok"]
        gap = diag["gap_hi"].astype(jnp.float64)
        pe = diag["primal_err_hi"].astype(jnp.float64)
        de = diag["dual_err_hi"].astype(jnp.float64)
        finite = jnp.isfinite(gap) & jnp.isfinite(pe) & jnp.isfinite(de)
        merit = jnp.maximum(jnp.maximum(jnp.abs(gap), pe), de)
        merit = jnp.where(finite & ok, merit, jnp.inf)

        improved = merit < best_merit
        best = _tree_where(improved, new_state, best)
        best_diag = _tree_where(improved, diag, best_diag)
        best_merit = jnp.where(improved, merit, best_merit)
        # explosion detector (SolverConfig.blowup_factor): past-the-floor
        # iterations burn the stall budget blowup_weight at a time
        exploded = merit > best_merit * cfg.blowup_factor
        stall = jnp.where(
            improved, 0, stall + jnp.where(exploded, cfg.blowup_weight, 1)
        )

        primal_feas = pe < cfg.primal_error_threshold
        dual_feas = de < cfg.dual_error_threshold
        new_pd = primal_feas & dual_feas
        converged = new_pd & (gap < cfg.duality_gap_threshold)

        status = jnp.where(
            ~ok,
            NUMERICAL_FAIL,
            jnp.where(
                converged,
                OPTIMAL,
                jnp.where(
                    jnp.bool_(cfg.need_primal_feasible) & primal_feas,
                    PRIMAL_FEASIBLE,
                    jnp.where(
                        jnp.bool_(cfg.need_dual_feasible) & dual_feas,
                        DUAL_FEASIBLE,
                        jnp.where(stall >= cfg.stall_patience, STALLED, RUNNING),
                    ),
                ),
            ),
        ).astype(jnp.int32)
        # on factorization failure the produced state is garbage: keep the
        # entering state for the host (it can escalate from it)
        state_out = _tree_where(ok, new_state, state)
        return (state_out, new_pd, itn + 1, status, best, best_merit, stall,
                diag, best_diag)

    @jax.jit
    def run_chunk(problem, carry, itn_stop):
        def cond_fn(carry):
            return (carry[3] == RUNNING) & (carry[2] < itn_stop)

        return jax.lax.while_loop(cond_fn, lambda c: body(c, problem), carry)

    def init_carry(problem, state, pd_feas: bool = False):
        pd = jnp.bool_(pd_feas)
        diag_spec = jax.eval_shape(lambda pr, st, p: one_iter(pr, st, p)[1],
                                   problem, state, pd)
        diag0 = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), diag_spec
        )
        return (
            state,
            pd,
            jnp.int32(0),
            jnp.int32(RUNNING),
            state,
            jnp.float64(np.inf),
            jnp.int32(0),
            diag0,
            diag0,
        )

    return run_chunk, init_carry


def solve_on_device(
    problem,
    cfg: Optional[SolverConfig] = None,
    initial=None,
    initial_solutions=(),
    chunk: int = 25,
    **kwargs,
) -> SolveResult:
    """Solve with the device-resident loop; host touches the device once per
    `chunk` iterations.  Handles the same sticky Cholesky->LU degradation
    ladder as the phase-split driver (recompiling the loop on switch).

    `initial` is an INTERNAL-coordinates state; `initial_solutions` is a
    user-coordinates (x, y, X, Y) warm start (MPMP.jl:613-614) — the
    x_sigma / y_R transforms are applied here, as in solverank1sdp.
    """
    import dataclasses

    from clrs_tpu.core.solver import compute_duality_gap  # noqa: F401
    from clrs_tpu.ops.xfloat import xf_mul as _xf_mul

    cfg = cfg or SolverConfig(**kwargs)
    from clrs_tpu.ops.xfloat import scaled_mode as _scm

    if initial is None and len(initial_solutions) == 4:
        st = list(initial_solutions)
        with _scm(cfg.scale_bits):
            if problem.x_sigma is not None:
                st[0] = _xf_mul(st[0], problem.x_sigma)
            if problem.y_R is not None:
                from clrs_tpu.ops.xfloat import xf_matmul as _xf_matmul

                st[1] = _xf_matmul(problem.y_R, st[1])
        initial = tuple(st)
    state = initial if initial is not None else initial_state(problem, cfg)

    run_chunk, init_carry = make_device_solve(problem, cfg)
    carry = init_carry(problem, state)
    t0 = time.time()
    history: List[Dict[str, float]] = []
    if cfg.verbose:
        print(
            f"{'iter':>5} {'time(s)':>8} {'mu':>11} {'P-obj':>11} {'D-obj':>11} "
            f"{'gap':>10} {'P-error':>10} {'p-error':>10} {'d-error':>10}"
        )

    status_code = RUNNING
    while True:
        itn_stop = jnp.int32(min(int(carry[2]) + chunk, cfg.maxiterations))
        # first chunk call traces the scan body; high-k traces need the
        # scoped recursion-limit raise (utils/limits)
        from clrs_tpu.utils.limits import raised_recursion_limit

        with raised_recursion_limit():
            carry = jax.block_until_ready(run_chunk(problem, carry, itn_stop))
        itn = int(carry[2])
        status_code = int(carry[3])
        diag = {kk: np.asarray(v) for kk, v in carry[7].items()}
        row = dict(
            iter=itn,
            time=time.time() - t0,
            mu=float(diag["mu"]),
            p_obj=float(diag["p_obj"]),
            d_obj=float(diag["d_obj"]),
            gap=float(diag["gap_hi"]),
            P_err=float(diag["P_err"]),
            p_err=float(diag["p_err"]),
            d_err=float(diag["d_err"]),
            alpha_p=float(diag["alpha_p"]),
            alpha_d=float(diag["alpha_d"]),
            beta=float(diag["beta_c"]),
        )
        history.append(row)
        if cfg.verbose:
            print(
                f"{itn:5d} {row['time']:8.1f} {row['mu']:11.3e} "
                f"{row['p_obj']:11.3e} {row['d_obj']:11.3e} {row['gap']:10.2e} "
                f"{row['P_err']:10.2e} {row['p_err']:10.2e} {row['d_err']:10.2e}"
            )
        if status_code == NUMERICAL_FAIL:
            # sticky degradation ladder (reference MPMP.jl:762-801): retry
            # with LU for both X^-1 and the Schur factorization
            if not (cfg.use_lu_inverse and cfg.use_lu_schur):
                if cfg.verbose:
                    print("factorization failed — switching to LU (sticky)")
                cfg = dataclasses.replace(
                    cfg, use_lu_inverse=True, use_lu_schur=True
                )
                run_chunk, init_carry = make_device_solve(problem, cfg)
                # keep iterate/diagnostic progress, reset stall counter
                carry = (
                    carry[0], carry[1], carry[2], jnp.int32(RUNNING),
                    carry[4], carry[5], jnp.int32(0), carry[7], carry[8],
                )
                continue
            break
        if status_code != RUNNING or itn >= cfg.maxiterations:
            break

    state = carry[0]
    best_state = carry[4]
    best_merit = float(carry[5])
    converged = status_code in (OPTIMAL, PRIMAL_FEASIBLE, DUAL_FEASIBLE)
    status = _STATUS_NAMES.get(status_code, "max_iterations")
    last = history[-1] if history else {}
    if status_code in (NUMERICAL_FAIL, STALLED) and np.isfinite(best_merit):
        state = best_state  # best-iterate contract (solver.py stall guard)
        # report the BEST iterate's metrics, not the (possibly exploded)
        # last ones — gap/objectives must describe the returned state
        bd = {kk: np.asarray(v) for kk, v in carry[8].items()}
        last = dict(
            gap=float(bd["gap_hi"]), p_obj=float(bd["p_obj"]),
            d_obj=float(bd["d_obj"]),
        )
    x, y, X, Y = state
    from clrs_tpu.ops.xfloat import scaled_mode, xf_div, xf_matmul

    with scaled_mode(cfg.scale_bits):
        if problem.x_sigma is not None:
            x = xf_div(x, problem.x_sigma)
        if problem.y_R_inv is not None:
            y = xf_matmul(problem.y_R_inv, y)
    res = SolveResult(
        x=x, X=X, y=y, Y=Y, P=None, p=None, d=None,
        dual_gap=last.get("gap", float("nan")),
        primal_objective=last.get("p_obj", float("nan")),
        dual_objective=last.get("d_obj", float("nan")),
        time_total=time.time() - t0,
        iterations=int(carry[2]),
        converged=converged,
        status=status,
        history=history,
    )
    if cfg.verbose:
        print(
            f"status: {res.status}  iterations: {res.iterations}  "
            f"time: {res.time_total:.2f}s"
        )
    return res
