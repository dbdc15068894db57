"""Auxiliary subsystems: checkpoint/resume, warm start, escalation
re-rounding, SDPB export, the multivariate solvempmp path, load balancer."""

import os

import mpmath
import numpy as np
import pytest

from clrs_tpu.core.blockinfo import distribute_weights_swapping, get_block_info
from clrs_tpu.core.solver import initial_state, SolverConfig, solverank1sdp
from clrs_tpu.core.problem import pack_constraints
from clrs_tpu.utils.checkpoint import load_state, save_state

mpmath.mp.prec = 200


def lp_constraints():
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    A = [[[np.asarray(v, dtype=object).reshape(-1)] for v in vs]]
    H = [[[1.0] for _ in range(2)]]
    return [(A, np.asarray([[1.0], [1.0]], dtype=object), np.asarray([2.0, 3.0], dtype=object), H)]


def test_checkpoint_roundtrip(tmp_path):
    cons = lp_constraints()
    info = get_block_info(cons)
    problem = pack_constraints(cons, [1.0], info=info)
    cfg = SolverConfig(omega_p=10.0, omega_d=10.0)
    state = initial_state(problem, cfg)
    path = str(tmp_path / "ckpt.npz")
    save_state(path, state, info, meta={"iter": 7})
    (x, y, X, Y), meta = load_state(path, info)
    assert meta["iter"] == 7
    np.testing.assert_array_equal(np.asarray(x.limbs), np.asarray(state[0].limbs))
    np.testing.assert_array_equal(
        np.asarray(X[0][0].limbs), np.asarray(state[2][0][0].limbs)
    )
    # re-round to k=3: padded limbs, exact value
    (x3, _, X3, _), _ = load_state(path, info, k=3)
    assert x3.k == 3
    np.testing.assert_array_equal(np.asarray(x3.limbs[:2]), np.asarray(x.limbs))
    assert np.all(np.asarray(x3.limbs[2]) == 0)


def test_warm_start_resumes():
    cons = lp_constraints()
    info = get_block_info(cons)
    res1 = solverank1sdp(
        cons, [1.0], info, omega_p=100.0, omega_d=100.0, maxiterations=10, verbose=False
    )
    assert not res1.converged
    res2 = solverank1sdp(
        cons,
        [1.0],
        info,
        omega_p=100.0,
        omega_d=100.0,
        maxiterations=200,
        verbose=False,
        initial_solutions=(res1.x, res1.y, res1.X, res1.Y),
    )
    assert res2.converged
    # warm start should need fewer iterations than the cold solve
    res_cold = solverank1sdp(
        cons, [1.0], info, omega_p=100.0, omega_d=100.0, maxiterations=200, verbose=False
    )
    assert res2.iterations < res_cold.iterations


def test_solvempmp_univariate():
    """solvempmp end-to-end: minimize over y s.t. y*1 - x >= 0 on [0,1]
    forces y >= 1; objective max -y -> y* = 1."""
    from clrs_tpu.models.poly import MPoly, poly_matrix
    from clrs_tpu.models.samples import create_sample_points_chebyshev
    from clrs_tpu.models.mpmp import solvempmp

    x = MPoly.var(0, 1)
    one = MPoly.constant(1, 1)
    # constraint: -x + y*1 >= 0 on [0,1]  (M0 = -x, M1 = 1)
    M = [[poly_matrix([[-x]]), poly_matrix([[one]])]]
    G = [[one, x * (one - x)]]
    q = [[one, x]]
    pts = [create_sample_points_chebyshev(2, 0, 1)]
    # dd noise floor: dual error ~ eps_dd/mu, so the reference's 1e-30
    # error contract needs k>=3 here; at k=2 use dd-appropriate thresholds
    res = solvempmp(
        M, G, q, pts, [2], [-1.0],
        omega_p=100.0, omega_d=100.0, maxiterations=150, verbose=False,
        duality_gap_threshold=1e-10, primal_error_threshold=1e-20,
        dual_error_threshold=1e-12,
    )
    assert res.converged, res.status
    assert abs(res.dual_objective - (-1.0)) < 1e-9  # max -y at y=1


def test_solvempmp_multivariate():
    """Two-variable PMP through the simplex sample points and monomial
    basis: y - (x0 + x1) >= 0 on the unit simplex -> y* = 1.

    delta=1 keeps the dual SOS representation essentially unique (the
    delta=2 variant has a 3-dim dual kernel and is precision-hard; see
    test_escalation_on_degenerate_mpmp)."""
    from clrs_tpu.models.bases import make_monomial_basis
    from clrs_tpu.models.poly import MPoly, poly_matrix
    from clrs_tpu.models.samples import create_sample_points
    from clrs_tpu.models.mpmp import solvempmp

    x0, x1 = MPoly.gens(2)
    one = MPoly.constant(1, 2)
    M = [[poly_matrix([[-(x0 + x1)]]), poly_matrix([[one]])]]
    # weights certify the simplex: 1, x0, x1, 1-x0-x1
    G = [[one, x0, x1, one - x0 - x1]]
    q = [make_monomial_basis(2, 0)]
    pts = [create_sample_points(2, 1)]
    res = solvempmp(
        M, G, q, pts, [1], [-1.0],
        omega_p=100.0, omega_d=100.0, maxiterations=150, verbose=False,
        duality_gap_threshold=1e-10, primal_error_threshold=1e-20,
        dual_error_threshold=1e-12,
    )
    assert res.converged, res.status
    assert abs(res.dual_objective - (-1.0)) < 1e-8


@pytest.mark.slow
def test_escalation_on_degenerate_mpmp():
    """The delta=2 simplex PMP has a 3-dim dual-degenerate kernel: at k=2
    the dual error floor sits above the target and the solver stalls; the
    escalation ladder must climb to k=3 and converge (SURVEY.md §5.3)."""
    from clrs_tpu.core.escalate import solve_with_escalation
    from clrs_tpu.models.bases import make_monomial_basis
    from clrs_tpu.models.poly import MPoly, poly_matrix
    from clrs_tpu.models.prepare import prepareabc
    from clrs_tpu.models.samples import create_sample_points

    x0, x1 = MPoly.gens(2)
    one = MPoly.constant(1, 2)
    M = [poly_matrix([[-(x0 + x1)]]), poly_matrix([[one]])]
    G = [one, x0, x1, one - x0 - x1]
    q = make_monomial_basis(2, 1)
    pts = create_sample_points(2, 2)
    cons = [prepareabc(M, G, q, pts, 2)]
    res = solve_with_escalation(
        cons, [-1.0], get_block_info(cons), k_ladder=(2, 3),
        omega_p=100.0, omega_d=100.0, maxiterations=200, verbose=False,
        duality_gap_threshold=1e-10, primal_error_threshold=1e-18,
        dual_error_threshold=1e-14,
    )
    # the dual kernel makes full feasibility unattainable at any fixed
    # precision (Y diverges along the kernel); the ladder + stall guard
    # must still deliver the optimum to high accuracy via the best iterate
    # best-across-rungs result is returned regardless of final status
    assert abs(res.dual_objective - (-1.0)) < 1e-6
    assert res.dual_gap < 1e-6


def test_reround_state_scale_crossing():
    """Warm starts crossing expansion representations (plain <-> scaled,
    core/escalate._reround_state): the per-limb power-of-two rescale is
    EXACT for f32->f32 (same significand, shifted exponent) and for the
    scaled-f32 -> plain-f64 host handoff."""
    import mpmath

    from clrs_tpu.core.escalate import _reround_state
    from clrs_tpu.ops.xfloat import scaled_mode, xf_from_mp, xf_to_mp

    mpmath.mp.prec = 400
    vals = np.array(
        [mpmath.mpf(3) / 7, mpmath.mpf(10) ** -6 * mpmath.sqrt(2)],
        dtype=object,
    )
    x = xf_from_mp(vals, k=4, dtype=np.float32)  # plain f32, ~2^-96 rel
    ref = xf_to_mp(x)
    state = (x, x, [[x]], [[x]])

    # plain f32 k=4 -> scaled f32 k=6 (the TPU ladder's climb)
    up = _reround_state(state, 6, from_scale=0, to_scale=24)
    with scaled_mode(24):
        got = xf_to_mp(up[0])
    assert all(g == r for g, r in zip(got, ref)), (got, ref)
    assert np.asarray(up[2][0][0].limbs).shape[0] == 6

    # scaled f32 k=6 -> plain f64 host rung (the ladder's handoff)
    class _W:  # minimal XF-like wrapper for the scaled source
        def __init__(self, limbs):
            self.limbs = limbs

    down = _reround_state(
        tuple([_W(np.asarray(s.limbs)) for s in (up[0], up[1])]
              + [[[_W(np.asarray(up[2][0][0].limbs))]],
                 [[_W(np.asarray(up[3][0][0].limbs))]]]),
        6, dtype=np.float64, host=True, from_scale=24, to_scale=0,
    )
    from clrs_tpu.core.hostxf import HXF

    assert isinstance(down[0], HXF)
    back = xf_to_mp(down[0])
    assert all(g == r for g, r in zip(back, ref)), (back, ref)


def test_sdpb_export(tmp_path):
    from clrs_tpu.apps.sdpb_export import write_sdpb_files

    cons = lp_constraints()
    info = get_block_info(cons)
    write_sdpb_files(str(tmp_path), cons, info, [1.0])
    import json

    with open(tmp_path / "objectives.json") as f:
        obj = json.load(f)
    assert len(obj["b"]) == 1
    with open(tmp_path / "block_0.json") as f:
        blk = json.load(f)
    assert blk["num_points"] == 2
    assert len(blk["c"]) == 2


def test_distribute_weights():
    weights = [64, 27, 8, 1, 1, 1, 1, 1]
    sets, set_weights = distribute_weights_swapping(weights, 3)
    assert sorted(i for s in sets for i in s) == list(range(8))
    assert max(set_weights) <= 64 + 2  # the 64 block dominates; others balance
    assert len(sets) == 3


def test_subproc_flag_selection_logic():
    """Per-k XLA flag automation (core/subproc.py): k>=4 wants backend
    opt level 0 (level>=1 LLVM compiles cliff on the wide factorization
    loop bodies), lower k wants the level-1 default."""
    from clrs_tpu.core import subproc

    assert "level=0" in subproc.xla_flags_for_k(4)
    assert "level=0" in subproc.xla_flags_for_k(6)
    assert "level=1" in subproc.xla_flags_for_k(2)
    assert "fusion_emitters=false" in subproc.xla_flags_for_k(2)
    # this process: conftest/clrs_tpu set level 1 -> k=2 in-process,
    # k>=4 isolated
    assert not subproc.needs_isolation(2)
    assert not subproc.needs_isolation(3)
    assert subproc.needs_isolation(4)


@pytest.mark.slow
def test_subproc_solve_roundtrip():
    """A k=4 solve through the subprocess boundary (exact host data in,
    numpy-limbed SolveResult out) reproduces the in-process answer."""
    import mpmath
    from clrs_tpu.core.blockinfo import get_block_info
    from clrs_tpu.core.subproc import solve_in_subprocess

    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    A = [[[v] for v in vs]]
    H = [[[mpmath.mpf(1)], [mpmath.mpf(1)]]]
    cons = [(A, np.asarray([[1.0], [2.0]], dtype=object),
             np.asarray([1.0, 1.0], dtype=object), H)]
    res = solve_in_subprocess(
        cons, [1.0], get_block_info(cons), 4,
        platform="cpu", omega_p=100.0, omega_d=100.0,
        maxiterations=200, verbose=False)
    assert res.converged, res.status
    assert abs(res.primal_objective - 0.5) < 1e-12
    assert isinstance(np.asarray(res.y.limbs), np.ndarray)


def test_escalation_reaches_host_rung_full_contract():
    """The two-stage ladder (SURVEY.md §5.3 + round-2 host path): at k=2
    the Delsarte 2d=6 solve stalls far above the reference's FULL
    contract (gap<1e-15 AND errors<1e-30); the ladder must hand off to
    the native host rung and land it."""
    from clrs_tpu.apps.delsarte import build_delsarte_constraints
    from clrs_tpu.core.escalate import solve_with_escalation

    cons, b, info = build_delsarte_constraints(8, 3, prec=700)
    res = solve_with_escalation(
        cons, b, info, k_ladder=(2,), host_ladder=(6,),
        omega_p=100.0, omega_d=100.0, maxiterations=300, verbose=False,
        duality_gap_threshold=1e-15, primal_error_threshold=1e-30,
        dual_error_threshold=1e-30,
    )
    assert res.converged and res.status == "optimal", res.status
    bound = 1.0 - res.dual_objective
    assert abs(bound - 240.0) < 1e-9, bound
    row = res.history[-1]
    assert row["gap"] < 1e-15
    assert max(row["P_err"], row["p_err"], row["d_err"]) < 1e-30


def test_device_loop_warm_start_user_coords():
    """solve_on_device(initial_solutions=...) applies the x_sigma / y_R
    transforms like solverank1sdp (MPMP.jl:613-614 warm start)."""
    import numpy as np

    from clrs_tpu.core.device_loop import solve_on_device
    from clrs_tpu.core.problem import pack_constraints
    from clrs_tpu.core.solver import solverank1sdp

    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    A = [[[v] for v in vs]]
    H = [[[1.0], [1.0]]]
    cons = [(A, np.asarray([[1.0], [2.0]], dtype=object),
             np.asarray([1.0, 1.0], dtype=object), H)]
    info = get_block_info(cons)
    res1 = solverank1sdp(
        cons, [1.0], info, omega_p=100.0, omega_d=100.0,
        maxiterations=12, verbose=False)
    problem = pack_constraints(cons, [1.0], info=info)
    res2 = solve_on_device(
        problem, initial_solutions=(res1.x, res1.y, res1.X, res1.Y),
        omega_p=100.0, omega_d=100.0, maxiterations=100, verbose=False,
        chunk=20,
    )
    assert res2.converged, res2.status
    assert abs(res2.primal_objective - 0.5) < 1e-9


def test_solvempmp_host_backend_full_contract():
    """solvempmp(backend='host') reaches the reference's FULL default
    contract on the univariate PMP — the same solve that needs loosened
    thresholds at dd (k=2) lands gap<1e-15 AND errors<1e-30 at k=6."""
    from clrs_tpu.models.mpmp import solvempmp
    from clrs_tpu.models.poly import MPoly, poly_matrix
    from clrs_tpu.models.samples import create_sample_points_chebyshev

    x = MPoly.var(0, 1)
    one = MPoly.constant(1, 1)
    M = [[poly_matrix([[-x]]), poly_matrix([[one]])]]
    G = [[one, x * (one - x)]]
    q = [[one, x]]
    pts = [create_sample_points_chebyshev(2, 0, 1)]
    res = solvempmp(
        M, G, q, pts, [2], [-1.0], backend="host", precision_k=6,
        omega_p=100.0, omega_d=100.0, maxiterations=150, verbose=False,
    )
    assert res.converged and res.status == "optimal", res.status
    assert abs(res.dual_objective - (-1.0)) < 1e-12
    row = res.history[-1]
    assert row["gap"] < 1e-15
    assert max(row["P_err"], row["p_err"], row["d_err"]) < 1e-30
