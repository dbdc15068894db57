"""Cross-check the device solver against the independent mpmath oracle IPM
(SURVEY.md §4: the reference's only cross-validation hook is exporting to
SDPB as an external oracle, examples/SpherePacking.jl:95-98 — here the
oracle is in-repo)."""

import mpmath
import numpy as np
import pytest

from clrs_tpu.core.blockinfo import get_block_info
from clrs_tpu.core.solver import solverank1sdp
from clrs_tpu.utils.oracle import solve_oracle


def make_lp_constraint(vs, B, c):
    K = len(vs)
    A = [[[np.asarray(v, dtype=object).reshape(-1)] for v in vs]]
    H = [[[1.0] for _ in range(K)]]
    return (A, np.asarray(B, dtype=object), np.asarray(c, dtype=object), H)


def test_oracle_matches_solver_lp():
    """Both implementations must land on the same optimum of a tiny LP-SDP."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [make_lp_constraint(vs, [[1.0], [2.0]], [1.0, 1.0])]
    b = [1.0]
    info = get_block_info(cons)

    old = mpmath.mp.dps
    mpmath.mp.dps = 60
    try:
        orc = solve_oracle(cons, b, info, maxiterations=150, omega_p=100.0,
                           omega_d=100.0)
    finally:
        mpmath.mp.dps = old
    assert orc["converged"], orc["status"]
    # analytic optimum: x = (0, 1/2), objective 1/2
    assert abs(float(orc["primal_objective"]) - 0.5) < 1e-12

    res = solverank1sdp(cons, b, info, omega_p=100.0, omega_d=100.0,
                        maxiterations=200, verbose=False)
    assert res.converged
    assert abs(res.primal_objective - float(orc["primal_objective"])) < 1e-12
    assert abs(res.dual_objective - float(orc["dual_objective"])) < 1e-12
    # the oracle's x and the solver's x agree entrywise
    x_solver = np.asarray(res.x.to_float64()).ravel()
    x_oracle = np.array([float(orc["x"][i]) for i in range(2)])
    assert np.allclose(x_solver, x_oracle, atol=1e-10)


def test_oracle_matches_solver_m2():
    """m=2 pairing logic against the oracle's dense Sym(E_rs ⊗ vv^T) matrices."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    K = len(vs)
    A = [[[np.asarray(v, dtype=object).reshape(-1)] for v in vs]]
    H = [[[1.0] for _ in range(K)]]
    dim = 3 * K
    B = np.zeros((dim, 1), dtype=object)
    B[0, 0] = 1.0
    B[1, 0] = 1.0
    B[4, 0] = 1.0
    B[5, 0] = 1.0
    c = np.array([1.0, 1.0, 0.0, 0.0, 2.0, 2.0], dtype=object)
    cons = [(A, B, c, H)]
    info = get_block_info(cons)

    old = mpmath.mp.dps
    mpmath.mp.dps = 60
    try:
        orc = solve_oracle(cons, [1.0], info, maxiterations=150,
                           omega_p=100.0, omega_d=100.0)
    finally:
        mpmath.mp.dps = old
    assert orc["converged"], orc["status"]

    res = solverank1sdp(cons, [1.0], info, omega_p=100.0, omega_d=100.0,
                        maxiterations=300, verbose=False)
    assert res.converged
    assert abs(res.primal_objective - float(orc["primal_objective"])) < 1e-10
    assert abs(res.dual_objective - float(orc["dual_objective"])) < 1e-10


def test_dense_C_objective():
    """C != 0 path (the reference's non-AbsoluteZero case, MPMP.jl:599 C kwarg):
    X = sum x_i A_i - C >= 0 with C = diag(0.25, 0.5) turns the LP into
    min 2x1+3x2, x1+x2 = 2, x1 >= 1/4, x2 >= 1/2 -> x = (3/2, 1/2), obj 4.5;
    dual objective includes <C, Y>."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [make_lp_constraint(vs, [[1.0], [1.0]], [2.0, 3.0])]
    b = [2.0]
    C = [[np.array([[0.25, 0.0], [0.0, 0.5]], dtype=object)]]
    info = get_block_info(cons)

    res = solverank1sdp(cons, b, info, C=C, omega_p=100.0, omega_d=100.0,
                        maxiterations=300, verbose=False)
    assert res.converged, res.status
    assert abs(res.primal_objective - 4.5) < 1e-10
    assert abs(res.dual_objective - 4.5) < 1e-10
    x = np.asarray(res.x.to_float64()).ravel()
    assert np.allclose(x, [1.5, 0.5], atol=1e-8)

    old = mpmath.mp.dps
    mpmath.mp.dps = 60
    try:
        orc = solve_oracle(cons, b, info, C=C, maxiterations=150,
                           omega_p=100.0, omega_d=100.0)
    finally:
        mpmath.mp.dps = old
    assert orc["converged"], orc["status"]
    assert abs(float(orc["primal_objective"]) - 4.5) < 1e-12
    assert abs(res.dual_objective - float(orc["dual_objective"])) < 1e-10
