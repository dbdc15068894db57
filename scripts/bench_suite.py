"""Benchmark suite over the BASELINE.json configs (BASELINE.md table).

Prints one JSON line per config with steady-state IPM iterations/s on the
current backend (CPU: f64 limbs; TPU: f32 limbs), measured like bench.py
(lax.scan of full fused iterations, compile excluded), plus per-phase
ms/iter (Schur-build+factorization = "decomp") from the phase-split
driver — the numbers the reference prints per run (MPMP.jl:976-1013).

  python scripts/bench_suite.py [config ...]   # default: 1 3 4

Configs (BASELINE.json):
  1  Delsarte LP dim 8, 2d=10 (single main cluster + sign clusters)
  2  sphere packing 2d=30 (larger Schur: dim_S=93 main cluster, 32/30
     PSD blocks — the config where the matmul path choice matters)
  3  multi-cluster PMP: Delsarte 2d=6 (1 + 6 clusters; same as bench.py)
  4  multivariate solvempmp path: polynomial minimization on the simplex
  5  extended-precision multi-device: sphere packing 2d=16 (k=3) through
     the hetero bundle-sharded step on all visible devices (run under
     XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
     for the virtual-mesh variant)
  6  sphere packing 2d=16 (k=3 limbs, single device; round-1 config)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_rate(problem, cfg_kwargs, n_meas=20, reps=3, phases_too=True):
    import jax
    import jax.numpy as jnp

    import clrs_tpu.core.solver as S

    cfg = S.SolverConfig(verbose=False, **cfg_kwargs)
    no_scan = bool(os.environ.get("CLRS_SUITE_NO_SCAN"))
    if not no_scan:
        step = S.make_fused_step(problem, cfg)

        def scan_steps(problem, state):
            def body(s, _):
                s2, _diag = step(problem, s, jnp.bool_(False))
                return s2, None

            out, _ = jax.lax.scan(body, state, None, length=n_meas)
            return out

        scan_jit = jax.jit(scan_steps)
        state0 = S.initial_state(problem, cfg)
        jax.block_until_ready(scan_jit(problem, state0))  # compile
        times = []
        for _ in range(reps):
            t0 = time.time()
            out = jax.block_until_ready(
                scan_jit(problem, S.initial_state(problem, cfg)))
            times.append(time.time() - t0)
        times.sort()
        dt = times[len(times) // 2]
        _, diag = step(problem, out, jnp.bool_(False))
        rate = n_meas / dt
        gap = float(np.asarray(diag["gap_hi"]))
        ok = bool(np.asarray(diag["ok"]))
    else:
        # CLRS_SUITE_NO_SCAN: skip the fused-scan graph (a single whole-
        # iteration body can exceed the remote compile helper's memory at
        # high k) and derive a DISPATCH-BOUND it/s from the phase-split
        # loop below — an underestimate of the deployment shape, labeled
        # as such by the env knob's presence in the metric consumers.
        rate, gap, ok = float("nan"), float("nan"), True
    phase_ms = {}
    gap_trend = []
    if phases_too:
        phases = S.make_ipm_phases(problem, cfg)
        st = S.initial_state(problem, cfg)
        pd = jnp.bool_(False)
        acc = {}
        n_phase_iters = 20 if no_scan else 8
        for it in range(n_phase_iters):
            timed = it >= 2

            def tick(name, fn, *args):
                tp = time.time()
                o = fn(*args)
                jax.block_until_ready(o)
                if timed:
                    acc[name] = acc.get(name, 0.0) + time.time() - tp
                return o

            mu, R, X_inv, _ = tick("Xinv+R", phases["mu_R_Xinv"], problem, st, pd)
            decomp = tick("decomp", phases["decomp"], problem, X_inv, st[3])
            P, p, dr = tick("residuals", phases["residuals"], problem,
                            st[0], st[2], st[1], decomp["A_Y"])
            dx, dX, dy, dY = tick("direction", phases["direction"], problem,
                                  P, p, dr, R, X_inv, st[3], decomp)
            beta_c, R2 = tick("corrector_R", phases["corrector_R"],
                              st[2], st[3], dX, dY, mu, pd)
            dx, dX, dy, dY = tick("direction", phases["direction"], problem,
                                  P, p, dr, R2, X_inv, st[3], decomp)
            ap, _ = tick("alpha", phases["steplength"], st[2], dX)
            ad, _ = tick("alpha", phases["steplength"], st[3], dY)
            st, d2 = tick("update", phases["update"], problem, st, dx, dy,
                          dX, dY, ap, ad, pd, P, p, dr, mu, beta_c)
            gap_trend.append(float(np.asarray(d2["gap_hi"])))
        timed_iters = n_phase_iters - 2
        phase_ms = {kk: round(1000.0 * v / timed_iters, 3)
                    for kk, v in acc.items()}
        if no_scan:
            total_ms = sum(phase_ms.values())
            rate = 1000.0 / total_ms if total_ms else float("nan")
            gap = gap_trend[-1]
            ok = bool(np.isfinite(gap))
    # MFU accounting (VERDICT r2 item 2 / BASELINE.json north star): the
    # scan-rate number is dispatch-free, so iteration_flops * rate / peak
    # is the honest whole-iteration utilization; the phase-split decomp
    # MFU is dispatch-inflated (remote-tunnel ~30 ms/call) and reported
    # as a lower bound only.
    mfu = {}
    try:
        from clrs_tpu.utils.flops import (
            decomp_flops, iteration_flops, vpu_peak_flops,
        )

        kind = jax.devices()[0].device_kind
        peak = vpu_peak_flops(kind)
        k = problem.b.k
        mfu["iter_vpu_mfu_scan"] = round(
            iteration_flops(problem.info, k) * rate / peak, 4)
        if "decomp" in phase_ms and phase_ms["decomp"] > 0:
            mfu["decomp_vpu_mfu_phase_split_lower_bound"] = round(
                decomp_flops(problem.info, k)
                / (phase_ms["decomp"] / 1e3) / peak, 4)
    except Exception:  # noqa: BLE001 — flop model must never break a bench
        pass
    return rate, gap, ok, phase_ms, mfu, gap_trend


def config_1():
    import jax
    import bench

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    problem, info = bench.build_problem(5, dtype)  # 2d = 10
    return problem, dict(omega_p=100.0, omega_d=100.0), "Delsarte dim-8 2d=10"


def _sphere_packing_problem(d: int, k: int, dtype, prec=320):
    import jax
    import mpmath
    from clrs_tpu.apps.sphere_packing import nsphere_packing_2point
    from clrs_tpu.core.problem import pack_constraints

    mpmath.mp.prec = prec
    r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]
    constraints, b, blockinfo = nsphere_packing_2point(
        3, d, r, 2, prec=prec, build_only=True,
    )
    return pack_constraints(constraints, b, info=blockinfo, k=k, dtype=dtype)


def config_2():
    """BASELINE config 2: sphere packing 2d=30 — the larger-Schur single
    main cluster (dim_S=93, PSD blocks 32/30; three dim-31 companions).
    CLRS_SUITE_PALLAS=1 / CLRS_SUITE_MXU=1 select the fused-Pallas /
    integer-MXU matmul paths (the decision input for their defaults)."""
    import jax

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    k = int(os.environ.get("CLRS_SUITE_C2_K", "2"))  # k=4 f32 is the
    # numerically-healthy on-chip rung for this config (dd overflows)
    problem = _sphere_packing_problem(15, k, dtype, prec=max(320, 53 * k + 150))
    kw = dict(omega_p=100.0, omega_d=100.0)
    label = f"sphere packing 2d=30 (k={k})"
    if os.environ.get("CLRS_SUITE_PALLAS"):
        kw["use_pallas_matmul"] = True
        label += " +pallas-matmul"
    if os.environ.get("CLRS_SUITE_PALLAS_INV"):
        kw["use_pallas_inverse"] = True
        label += " +pallas-inverse"
    if os.environ.get("CLRS_SUITE_MXU"):
        kw["use_mxu_matmul"] = True
        label += " +mxu-matmul"
    if os.environ.get("CLRS_SUITE_C2_STEPLEN"):
        # step-length factorization through the fused Pallas sandwich —
        # with PALLAS_INV this moves every per-block factorization out of
        # the HLO, which is what keeps high-k compiles within the remote
        # helper's memory (k=6 with XLA factorization loops OOMed it)
        kw["use_pallas_steplength"] = True
        label += " +pallas-steplen"
    if os.environ.get("CLRS_SUITE_C2_LU"):
        # S loses Cholesky-positivity within a few iterations on this
        # config at k=4 f32 (the host driver's sticky ladder switches to
        # LU; a device-resident scan cannot), so the healthy-numerics
        # scan measurement runs LU-from-start
        kw["use_lu_schur"] = True
        label += " +lu-schur"
    return problem, kw, label


def config_6():
    problem = _sphere_packing_problem(8, 3, np.float64, prec=512)
    return problem, dict(omega_p=100.0, omega_d=100.0), "sphere packing 2d=16 (k=3)"


def config_7():
    """Config 2 through the intra-cluster GSPMD sharding (parallel/intra.py)
    over all visible devices: the single-huge-cluster scaling axis
    (SURVEY.md §5.7).  T axes are rank-padded to divide the mesh."""
    import jax
    import jax.numpy as jnp

    import clrs_tpu.core.solver as S
    from clrs_tpu.parallel.intra import (
        make_chip_mesh, pad_info_ranks, shard_problem, shard_state,
    )
    import mpmath
    from clrs_tpu.apps.sphere_packing import nsphere_packing_2point
    from clrs_tpu.core.problem import pack_constraints

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    n_dev = len(jax.devices())
    mesh = make_chip_mesh(n_dev)
    mpmath.mp.prec = 320
    r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]
    constraints, b, blockinfo = nsphere_packing_2point(
        3, 15, r, 2, prec=320, build_only=True,
    )
    info = pad_info_ranks(blockinfo, n_dev)
    problem = pack_constraints(constraints, b, info=info, k=2, dtype=dtype)
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False)
    sp = shard_problem(problem, mesh)
    state = shard_state(S.initial_state(problem, cfg), mesh)
    step = S.make_fused_step(problem, cfg)
    state, diag = step(sp, state, jnp.bool_(False))  # compile
    jax.block_until_ready(state)
    n_meas, t0 = 20, time.time()
    for _ in range(n_meas):
        state, diag = step(sp, state, jnp.bool_(False))
    jax.block_until_ready(state)
    dt = time.time() - t0
    return None, dict(
        rate=n_meas / dt, gap=float(np.asarray(diag["gap_hi"])),
        ok=bool(np.asarray(diag["ok"])), n_devices=n_dev,
    ), f"intra-sharded sphere packing 2d=30 (dd, {n_dev} devices)"


def config_5():
    """Extended-precision multi-device: hetero bundle-sharded step rate on
    all visible devices (the >=2-hosts stand-in: virtual CPU mesh or a
    real multi-chip mesh; the collectives are identical)."""
    import jax
    import jax.numpy as jnp

    import clrs_tpu.core.solver as S
    from clrs_tpu.parallel.hetero import (
        bundles_from_problem, initial_bundle_state, make_cluster_mesh,
        make_hetero_step,
    )

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    k = int(os.environ.get("CLRS_SUITE_C5_K", "2"))  # BASELINE.json names
    # double-double for this config; higher k via env for experiments
    problem = _sphere_packing_problem(8, k, dtype, prec=512)
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False)
    n_dev = len(jax.devices())
    mesh = make_cluster_mesh(n_dev)
    shapes, data, owners = bundles_from_problem(problem, n_dev)
    bstates, y = initial_bundle_state(
        shapes, cfg.omega_p, cfg.omega_d, k, dtype, problem.info.n_y)
    step = make_hetero_step(shapes, mesh, problem.b, cfg, b0=problem.b0)
    state = (bstates, y)
    state, diag = step(tuple(data), state, jnp.bool_(False))  # compile
    import jax as _j
    _j.block_until_ready(state)
    n_meas, t0 = 20, time.time()
    for _ in range(n_meas):
        state, diag = step(tuple(data), state, jnp.bool_(False))
    _j.block_until_ready(state)
    dt = time.time() - t0
    return None, dict(
        rate=n_meas / dt, gap=float(np.asarray(diag["gap"])),
        ok=bool(np.asarray(diag["ok"])), n_devices=n_dev,
    ), f"hetero-sharded sphere packing 2d=16 (k={k}, {n_dev} devices)"


def config_3():
    import jax
    import bench

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    problem, info = bench.build_problem(3, dtype)  # 1 + 6 clusters
    return problem, dict(omega_p=100.0, omega_d=100.0), "multi-cluster PMP (Delsarte 2d=6, J=7)"


def config_4():
    import jax
    import mpmath
    from clrs_tpu.core.blockinfo import get_block_info
    from clrs_tpu.core.problem import pack_constraints
    from clrs_tpu.models.bases import make_monomial_basis
    from clrs_tpu.models.poly import MPoly, poly_matrix
    from clrs_tpu.models.prepare import prepareabc
    from clrs_tpu.models.samples import create_sample_points

    # the prepareabc pipeline on a 2-variable simplex minimization
    # (apps/polymin.py construction, d=2)
    mpmath.mp.prec = 256
    nvars, d = 2, 2
    xs = MPoly.gens(nvars)
    one = MPoly.constant(1, nvars)
    f = xs[0] * xs[0] + xs[1] * xs[1] - xs[0] * xs[1] + one
    delta = max(f.total_degree(), 2 * d + 1)
    G = [one] + list(xs) + [one - sum(xs[1:], xs[0])]
    q = make_monomial_basis(nvars, d)
    pts = create_sample_points(nvars, delta)
    cons = [prepareabc([poly_matrix([[f]]), poly_matrix([[-one]])],
                       G, q, pts, delta)]
    info = get_block_info(cons)
    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    problem = pack_constraints(cons, [1.0], info=info, k=2, dtype=dtype)
    return problem, dict(omega_p=10.0, omega_d=10.0), \
        "multivariate solvempmp path (2-var simplex polymin, d=2)"


def main():
    import jax

    if os.environ.get("CLRS_FORCE_CPU"):
        # the axon TPU plugin overrides JAX_PLATFORMS (CLAUDE.md); this is
        # the reliable way to pin the suite to the host CPU
        jax.config.update("jax_platforms", "cpu")

    which = [int(a) for a in sys.argv[1:]] or [1, 3, 4]
    builders = {1: config_1, 2: config_2, 3: config_3, 4: config_4,
                5: config_5, 6: config_6, 7: config_7}
    platform = jax.default_backend()
    for c in which:
        try:
            problem, kw, name = builders[c]()
            if problem is None:  # config measured itself (hetero step)
                print(json.dumps(dict(
                    config=c, metric=f"IPM iterations/s, {name}",
                    value=round(kw["rate"], 2), unit="iterations/s",
                    platform=platform, n_devices=kw["n_devices"],
                    ok=kw["ok"],
                )))
                continue
            rate, gap, ok, phase_ms, mfu, gap_trend = measure_rate(problem, kw)
            out = dict(
                config=c, metric=f"IPM iterations/s, {name}", value=round(rate, 2),
                unit="iterations/s", platform=platform, gap_after_20=gap, ok=ok,
                phase_ms_per_iter=phase_ms, mfu=mfu,
            )
            if os.environ.get("CLRS_SUITE_NO_SCAN"):
                out["mode"] = "phase-split (dispatch-bound; no fused scan)"
                out["gap_trend"] = [float(f"{g:.3e}") for g in gap_trend]
            print(json.dumps(out))
        except Exception as e:  # noqa: BLE001
            print(json.dumps(dict(config=c, error=repr(e)[:200])))


if __name__ == "__main__":
    main()
