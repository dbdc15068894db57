"""Benchmark suite over the BASELINE.json configs (BASELINE.md table).

Prints one JSON line per config with steady-state IPM iterations/s on the
current backend (CPU: f64 limbs; TPU: f32 limbs), measured like bench.py
(lax.scan of full fused iterations, compile excluded).

  python scripts/bench_suite.py [config ...]   # default: 1 3 4

Configs:
  1  Delsarte LP dim 8, 2d=10 (single main cluster + sign clusters)
  2  sphere packing 2d=16 (k=3 limbs; CPU-oriented, slow compile)
  3  multi-cluster PMP: Delsarte 2d=6 (1 + 6 clusters; same as bench.py)
  4  multivariate solvempmp path: polynomial minimization on the simplex
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_rate(problem, cfg_kwargs, n_meas=20, reps=3):
    import jax
    import jax.numpy as jnp

    import clrs_tpu.core.solver as S

    cfg = S.SolverConfig(verbose=False, **cfg_kwargs)
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
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(scan_jit(problem, S.initial_state(problem, cfg)))
    dt = (time.time() - t0) / reps
    _, diag = step(problem, out, jnp.bool_(False))
    return n_meas / dt, float(np.asarray(diag["gap_hi"])), bool(np.asarray(diag["ok"]))


def config_1():
    import jax
    import bench

    dtype = np.float32 if jax.default_backend() == "tpu" else np.float64
    problem, info = bench.build_problem(5, dtype)  # 2d = 10
    return problem, dict(omega_p=100.0, omega_d=100.0), "Delsarte dim-8 2d=10"


def config_2():
    import mpmath
    from clrs_tpu.apps.sphere_packing import nsphere_packing_2point
    from clrs_tpu.core.problem import pack_constraints

    mpmath.mp.prec = 512
    r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]
    _, _, (constraints, b, blockinfo) = nsphere_packing_2point(
        3, 8, r, 2, precision_k=3, maxiterations=1, verbose=False,
        return_problem=True,
    )
    problem = pack_constraints(constraints, b, info=blockinfo, k=3,
                               dtype=np.float64)
    return problem, dict(omega_p=100.0, omega_d=100.0), "sphere packing 2d=16 (k=3)"


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

    which = [int(a) for a in sys.argv[1:]] or [1, 3, 4]
    builders = {1: config_1, 2: config_2, 3: config_3, 4: config_4}
    platform = jax.default_backend()
    for c in which:
        try:
            problem, kw, name = builders[c]()
            rate, gap, ok = measure_rate(problem, kw)
            print(json.dumps(dict(
                config=c, metric=f"IPM iterations/s, {name}", value=round(rate, 2),
                unit="iterations/s", platform=platform, gap_after_20=gap, ok=ok,
            )))
        except Exception as e:  # noqa: BLE001
            print(json.dumps(dict(config=c, error=repr(e)[:200])))


if __name__ == "__main__":
    main()
