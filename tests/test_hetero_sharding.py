"""Heterogeneous cluster-sharded step (parallel/hetero.py): real problems
with mixed cluster shapes, sharded over a virtual device mesh.

SURVEY.md §4's multi-host test contract: shard the same problem over 1 vs N
devices and assert identical iterates; and the sharded step must agree with
the general (unsharded) solver phases on the same packed problem.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clrs_tpu  # noqa: F401  (flags)
from clrs_tpu.parallel.hetero import (
    bundles_from_problem,
    initial_bundle_state,
    make_cluster_mesh,
    make_hetero_step,
)


@pytest.fixture(scope="module")
def delsarte_problem():
    """Delsarte dim-8 2d=6 (the 240-sharp kissing config): 1 polynomial
    cluster + 6 sign clusters — two distinct shape signatures, so the
    bundling (incl. divisibility padding on 8 devices) is genuinely
    exercised.  (2d=4 is NOT used: that LP is unbounded and the IPM
    correctly diverges on it.)"""
    import bench

    problem, info = bench.build_problem(d=3, dtype=np.float64, k=2)
    return problem


def run_steps(problem, n_devices, n_steps=3):
    import clrs_tpu.core.solver as S

    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False)
    mesh = make_cluster_mesh(n_devices)
    shapes, data, owners = bundles_from_problem(problem, n_devices)
    bstates, y = initial_bundle_state(
        shapes, cfg.omega_p, cfg.omega_d, problem.b.k, problem.b.dtype,
        problem.info.n_y)
    step = make_hetero_step(shapes, mesh, problem.b, cfg, b0=problem.b0)
    state = (bstates, y)
    diag = None
    for _ in range(n_steps):
        state, diag = step(tuple(data), state, jnp.bool_(False))
    return state, diag


def test_hetero_one_vs_many_devices(delsarte_problem):
    """dd-ulp-identical iterates between 1-device and 8-device runs.

    Padding differs with the device count (bundle cluster counts round up
    to the mesh size), and XLA:CPU emits batch-width-dependent codegen, so
    agreement is to the double-double ulp rather than bitwise; all padded
    contributions are exact zeros by construction.
    """
    p = delsarte_problem
    s1, d1 = run_steps(p, 1)
    s8, d8 = run_steps(p, min(8, len(jax.devices())))
    y1 = np.asarray(s1[1].limbs).sum(axis=0)  # hi+lo
    y8 = np.asarray(s8[1].limbs).sum(axis=0)
    scale = np.max(np.abs(y1))
    np.testing.assert_allclose(y1, y8, rtol=0, atol=1e-28 * scale)
    for key in ("mu", "p_obj", "d_obj", "alpha_p", "alpha_d"):
        np.testing.assert_allclose(
            np.asarray(d1[key]), np.asarray(d8[key]), rtol=1e-12, atol=1e-20)
    assert bool(np.asarray(d1["ok"])) and bool(np.asarray(d8["ok"]))


def test_hetero_matches_general_solver(delsarte_problem):
    """One hetero-sharded step == one step of the unsharded solver phases
    on the same packed problem."""
    import clrs_tpu.core.solver as S

    p = delsarte_problem
    s1, d1 = run_steps(p, 1, n_steps=1)

    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False)
    phases = S.make_ipm_phases(p, cfg)
    st = S.initial_state(p, cfg)
    pd = jnp.bool_(False)
    mu, R, X_inv, ok = phases["mu_R_Xinv"](p, st, pd)
    decomp = phases["decomp"](p, X_inv, st[3])
    Pr, pr, dr = phases["residuals"](p, st[0], st[2], st[1], decomp["A_Y"])
    dxg, dXg, dyg, dYg = phases["direction"](p, Pr, pr, dr, R, X_inv, st[3], decomp)
    beta_c, R2 = phases["corrector_R"](st[2], st[3], dXg, dYg, mu, pd)
    dxg, dXg, dyg, dYg = phases["direction"](p, Pr, pr, dr, R2, X_inv, st[3], decomp)
    ap, _ = phases["steplength"](st[2], dXg)
    ad, _ = phases["steplength"](st[3], dYg)
    st2, diag = phases["update"](
        p, st, dxg, dyg, dXg, dYg, ap, ad, pd, Pr, pr, dr, mu, beta_c)

    y_sharded = np.asarray(s1[1].limbs[0]).ravel()
    y_general = np.asarray(st2[1].limbs[0]).ravel()
    np.testing.assert_allclose(y_sharded, y_general, rtol=1e-18, atol=1e-22)
    mu_s = float(np.asarray(d1["mu"]))
    mu_g = float(np.asarray(diag["mu"]))
    assert abs(mu_s - mu_g) < 1e-10 * max(1.0, abs(mu_g))


def test_hetero_converges(delsarte_problem):
    """The sharded driver (with feasibility-locked steps) converges and
    matches the unsharded solve's objective."""
    import clrs_tpu.core.solver as S
    from clrs_tpu.parallel.hetero import solve_hetero_sharded

    p = delsarte_problem
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False,
                         duality_gap_threshold=1e-12)
    mesh = make_cluster_mesh(min(8, len(jax.devices())))
    out = solve_hetero_sharded(p, mesh, maxiterations=150, cfg=cfg)
    assert out.dual_gap < 1e-9, out.status
    po = out.primal_objective

    res = S.solverank1sdp(
        problem=p, omega_p=100.0, omega_d=100.0, maxiterations=150,
        verbose=False)
    assert abs(po - res.primal_objective) < 1e-6 * max(1.0, abs(po))
    # the untransformed user-coordinate solutions agree too
    y_h = np.asarray(out.y.to_float64()).ravel()
    y_g = np.asarray(res.y.to_float64()).ravel()
    np.testing.assert_allclose(y_h, y_g, rtol=1e-6, atol=1e-8)
    x_h = np.asarray(out.x.to_float64()).ravel()
    x_g = np.asarray(res.x.to_float64()).ravel()
    scale = max(1.0, np.max(np.abs(x_g)))
    np.testing.assert_allclose(x_h, x_g, rtol=0, atol=1e-5 * scale)
    # P/p/d populated (SolveResult parity with the core solver): max-abs of
    # the returned residuals must agree with the iteration-log errors
    assert out.P is not None and out.p is not None and out.d is not None
    last = out.history[-1]
    p_res = np.max(np.abs(np.asarray(out.p.to_float64())))
    d_res = np.max(np.abs(np.asarray(out.d.to_float64())))
    P_res = max(
        float(np.max(np.abs(np.asarray(blk.to_float64()))))
        for j in range(len(out.P)) for blk in out.P[j]
    )
    assert P_res <= 10 * max(last["P_err"], 1e-30), (P_res, last["P_err"])
    assert p_res <= 10 * max(last["p_err"], 1e-30), (p_res, last["p_err"])
    assert d_res <= 10 * max(last["d_err"], 1e-25), (d_res, last["d_err"])


def test_hetero_nonzero_C():
    """C != 0 + b0 through the sharded path (MPMP.jl:589-592, 1031-1034):
    same analytic LP-as-SDP as test_solver_small.test_nonzero_C_objective —
    optimum 2.3 (+ b0), with <C,Y> carried in the dual objective."""
    import clrs_tpu.core.solver as S
    from clrs_tpu.core.blockinfo import get_block_info
    from clrs_tpu.core.problem import pack_constraints
    from clrs_tpu.parallel.hetero import solve_hetero_sharded

    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    A = [[[np.asarray(v, dtype=object).reshape(-1)] for v in vs]]
    H = [[[1.0], [1.0]]]
    cons = [(A, np.asarray([[1.0], [1.0]], dtype=object),
             np.asarray([2.0, 3.0], dtype=object), H)]
    C = [[np.array([[0.2, 0.0], [0.0, 0.3]], dtype=object)]]
    p = pack_constraints(cons, [1.0], info=get_block_info(cons), C=C, b0=10.0)
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False)
    mesh = make_cluster_mesh(min(8, len(jax.devices())))
    out = solve_hetero_sharded(p, mesh, maxiterations=200, cfg=cfg)
    assert out.converged, out.status
    assert abs(out.primal_objective - 12.3) < 1e-9
    assert abs(out.dual_objective - 12.3) < 1e-9
    x = np.asarray(out.x.to_float64()).ravel()
    assert abs(x[0] - 0.7) < 1e-7 and abs(x[1] - 0.3) < 1e-7


def test_hetero_k3_full_contract():
    """HEALTHY high-precision sharded solve (VERDICT r3 item 5): at k=3
    f64 limbs (the precision this config family needs for the full
    contract), the hetero driver (a) produces 1-vs-8-device iterates
    identical to the k=3 ulp (bundle padding differs with the device
    count — different leaf SHAPES — and XLA:CPU codegen is batch-width-
    dependent, so raw-bitwise is a hardware-only property; all padded
    contributions are exact zeros), and (b) lands the FULL reference
    contract (gap < 1e-15 AND errors < 1e-30, MPMP.jl:607-609) SHARDED,
    on Delsarte dim-8 2d=6."""
    import bench
    import clrs_tpu.core.solver as S
    from clrs_tpu.parallel.hetero import solve_hetero_sharded

    problem, _ = bench.build_problem(d=3, dtype=np.float64, k=3)

    # (a) 1-vs-8 at k=3 over a few steps: y agrees to the k=3 ulp
    s1, d1 = run_steps(problem, 1, n_steps=3)
    s8, d8 = run_steps(problem, min(8, len(jax.devices())), n_steps=3)
    # evaluate the limb expansions at full precision before comparing: a
    # plain f64 limb sum rounds away everything below ~1e-16·scale, so a
    # 1e-44 atol on it would silently degrade to bit-equality of the
    # rounded sums (ADVICE r4)
    import mpmath

    l1 = np.asarray(s1[1].limbs, np.float64).reshape(3, -1)
    l8 = np.asarray(s8[1].limbs, np.float64).reshape(3, -1)
    with mpmath.workprec(400):
        v1 = [mpmath.fsum(mpmath.mpf(float(x)) for x in l1[:, i])
              for i in range(l1.shape[1])]
        v8 = [mpmath.fsum(mpmath.mpf(float(x)) for x in l8[:, i])
              for i in range(l8.shape[1])]
        scale = max(abs(v) for v in v1) or mpmath.mpf(1)
        tol = mpmath.mpf("1e-44") * scale
        for a, b in zip(v1, v8):
            assert abs(a - b) <= tol, (a, b, tol)
    for key in ("mu", "p_obj", "d_obj", "alpha_p", "alpha_d"):
        np.testing.assert_allclose(
            np.asarray(d1[key]), np.asarray(d8[key]), rtol=1e-12, atol=1e-20)

    # (b) the full contract, sharded
    cfg = S.SolverConfig(
        omega_p=100.0, omega_d=100.0, verbose=False,
        duality_gap_threshold=1e-15,
        primal_error_threshold=1e-30, dual_error_threshold=1e-30,
    )
    mesh = make_cluster_mesh(min(8, len(jax.devices())))
    out = solve_hetero_sharded(problem, mesh, maxiterations=150, cfg=cfg)
    assert out.status == "optimal", (out.status, out.dual_gap)
    row = out.history[-1]
    assert out.dual_gap < 1e-15
    assert max(row["P_err"], row["p_err"]) < 1e-30
    assert row["d_err"] < 1e-30
    # kissing-number bound is exactly 240 on this config (bound =
    # 1 - dual_objective: the Delsarte objective carries the +1 constant)
    assert abs(1.0 - out.dual_objective - 240.0) < 1e-9
