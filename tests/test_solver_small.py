"""End-to-end IPM tests on tiny SDPs with analytic answers.

The clustered low-rank SDP (reference problem class, SURVEY.md §0):
  primal: min <c, x>  s.t.  B^T x = b,  X = sum_i x_i A_i - C >= 0
  dual:   max <b, y> + <C, Y>  s.t.  Tr(A_i Y) + (B y)_i = c_i,  Y >= 0
with A_(j,r,s,k) = sum_rnk H Sym(E_rs ⊗ v v^T).

With m=1 and orthogonal rank-1 vectors the SDP collapses to an LP we can
solve by hand — a sharp correctness anchor for the full predictor-corrector
loop before the polynomial front-end exists.
"""

import numpy as np
import pytest

from clrs_tpu.core.blockinfo import get_block_info
from clrs_tpu.core.solver import solverank1sdp


def make_lp_constraint(vs, B, c):
    """One cluster, m=1, rank-1 vectors: A[l][k] = [v_k], H = 1."""
    K = len(vs)
    A = [[[np.asarray(v, dtype=object).reshape(-1)] for v in vs]]
    H = [[[1.0] for _ in range(K)]]
    return (A, np.asarray(B, dtype=object), np.asarray(c, dtype=object), H)


def test_lp_as_sdp_single_cluster():
    """min 2 x1 + 3 x2  s.t.  x1 + x2 = 1,  x1 v1 v1^T + x2 v2 v2^T >= 0
    with v1, v2 orthogonal  =>  x = (1, 0), objective 2."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    B = [[1.0], [1.0]]
    c = [2.0, 3.0]
    cons = [make_lp_constraint(vs, B, c)]
    b = [1.0]
    res = solverank1sdp(
        cons,
        b,
        get_block_info(cons),
        omega_p=100.0,
        omega_d=100.0,
        maxiterations=200,
        verbose=False,
    )
    assert res.converged, res.status
    assert abs(res.primal_objective - 2.0) < 1e-10
    assert abs(res.dual_objective - 2.0) < 1e-10
    x = np.asarray(res.x.to_float64()).ravel()
    assert abs(x[0] - 1.0) < 1e-8 and abs(x[1]) < 1e-8
    # high-accuracy convergence contract (MPMP.jl:607-609)
    assert res.dual_gap < 1e-15
    assert res.history[-1]["P_err"] < 1e-25
    assert res.history[-1]["d_err"] < 1e-25
    # residuals are returned (MPMP.jl:1014-1020) and consistent with the
    # reported errors
    assert res.P is not None and res.p is not None and res.d is not None
    from clrs_tpu.core.solver import compute_error_bd
    from clrs_tpu.ops.xfloat import xf_norm_max

    P_err = float(np.asarray(compute_error_bd(res.P).to_float64()))
    d_err = float(np.asarray(xf_norm_max(res.d).to_float64()))
    assert abs(P_err - res.history[-1]["P_err"]) <= 1e-30 + 1e-6 * P_err
    assert abs(d_err - res.history[-1]["d_err"]) <= 1e-30 + 1e-6 * d_err


def test_lp_interior_solution():
    """Non-degenerate dual: min x1 + x2 s.t. x1+2x2 = 1 -> x=(1,0), obj 1."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    B = [[1.0], [2.0]]
    c = [1.0, 1.0]
    cons = [make_lp_constraint(vs, B, c)]
    res = solverank1sdp(
        cons,
        [1.0],
        get_block_info(cons),
        omega_p=100.0,
        omega_d=100.0,
        maxiterations=200,
        verbose=False,
    )
    assert res.converged
    # LP: min x1+x2, x1+2x2=1, x>=0 -> x=(0, 1/2), objective 1/2
    assert abs(res.primal_objective - 0.5) < 1e-10


def test_multi_cluster():
    """Two independent clusters sharing the free variable y through B."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    c1 = [1.0, 2.0]
    c2 = [3.0, 1.0]
    cons = [
        make_lp_constraint(vs, [[1.0], [1.0]], c1),
        make_lp_constraint(vs, [[1.0], [1.0]], c2),
    ]
    # LP: min c1.x1 + c2.x2 s.t. (x1_1+x1_2) + (x2_1+x2_2) = 1, x >= 0
    # cheapest entry overall has cost 1 -> objective 1
    res = solverank1sdp(
        cons,
        [1.0],
        get_block_info(cons),
        omega_p=100.0,
        omega_d=100.0,
        maxiterations=200,
        verbose=False,
    )
    assert res.converged
    assert abs(res.primal_objective - 1.0) < 1e-9


def test_true_sdp_m1():
    """Non-diagonal rank-1 vectors: true SDP behavior.

    A_k = v_k v_k^T with v1=(1,0), v2=(1,1)/sqrt(2), v3=(0,1).
    min c.x s.t. sum x_i = 1, sum x_i A_i >= 0.
    With all x_i >= 0 feasible; picks cheapest combination.
    Negative coefficients can still be feasible in SDP sense, so the
    optimum can be below min(c): just check primal ~= dual and residuals.
    """
    vs = [
        np.array([1.0, 0.0]),
        np.array([1.0, 1.0]) / np.sqrt(2.0),
        np.array([0.0, 1.0]),
    ]
    B = [[1.0], [1.0], [1.0]]
    c = [1.0, 4.0, 2.0]
    cons = [make_lp_constraint(vs, B, c)]
    # this instance has an unbounded dual optimal face (|Y| grows ~1/mu),
    # so the dual-residual floor eps*|Y| never meets a fixed threshold at
    # ANY precision; assert the meaningful contract: tiny gap at the best
    # iterate and a PSD primal
    res = solverank1sdp(
        cons,
        [1.0],
        get_block_info(cons),
        omega_p=100.0,
        omega_d=100.0,
        maxiterations=300,
        verbose=False,
        duality_gap_threshold=1e-12,
        primal_error_threshold=1e-25,
        dual_error_threshold=1e-25,
    )
    assert res.converged or res.status in ("stalled", "max_iterations"), res.status
    assert res.dual_gap < 1e-10
    assert abs(res.primal_objective - res.dual_objective) < 1e-9
    # X must be (near) PSD at the solution
    X00 = np.asarray(res.X[0][0].to_float64())
    evals = np.linalg.eigvalsh((X00 + X00.T) / 2)
    assert evals.min() > -1e-12


def test_m2_block():
    """m=2 constraint matrices exercise the (r,s) pairing logic.

    A_(r,s,k) = Sym(E_rs ⊗ v_k v_k^T), orthonormal v -> X block structure
    = [[x_(0,0,k) diag, x_(1,0,k)/2 diag],[x_(1,0,k)/2 diag, x_(1,1,k) diag]].
    Constraints fix the diagonal sums; minimize trace-like objective.
    """
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    K = len(vs)
    npair = 3  # (0,0), (1,0), (1,1)
    dim = npair * K
    A = [[[np.asarray(v, dtype=object).reshape(-1)] for v in vs]]
    H = [[[1.0] for _ in range(K)]]
    # B: single y variable coupling sum of diagonal tuples
    B = np.zeros((dim, 1), dtype=object)
    # tuple order: (r,s) pair-major, k minor: (0,0,k0),(0,0,k1),(1,0,..),(1,1,..)
    B[0, 0] = 1.0
    B[1, 0] = 1.0
    B[4, 0] = 1.0
    B[5, 0] = 1.0
    c = np.array([1.0, 1.0, 0.0, 0.0, 2.0, 2.0], dtype=object)
    cons = [(A, B, c, H)]
    res = solverank1sdp(
        cons,
        [1.0],
        get_block_info(cons),
        omega_p=100.0,
        omega_d=100.0,
        maxiterations=300,
        verbose=False,
    )
    assert res.converged
    # LP reduction: min sum(c_i x_i) s.t. x_(0,0,·) + x_(1,1,·) sums to 1,
    # PSD forces x_(0,0),x_(1,1) >= 0 (off-diag free but penalized by PSD)
    # cheapest: put everything in x_(0,0) -> objective 1
    assert abs(res.primal_objective - 1.0) < 1e-9


def test_nonzero_C_objective():
    """Dense C != 0 (the reference's non-AbsoluteZero branch, MPMP.jl:589-592,
    1031-1034): min <c,x> s.t. B^T x = b, sum_i x_i A_i - C >= 0.

    Orthonormal rank-1 A_i, C = diag(0.2, 0.3): X = diag(x1-0.2, x2-0.3),
    so x1 >= 0.2, x2 >= 0.3, x1+x2 = 1 -> min 2x1+3x2 = 3 - x1 at x1 = 0.7:
    objective 2.3.  The dual objective carries the <C, Y> term.
    """
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [make_lp_constraint(vs, [[1.0], [1.0]], [2.0, 3.0])]
    C = [[np.array([[0.2, 0.0], [0.0, 0.3]], dtype=object)]]
    res = solverank1sdp(
        cons,
        [1.0],
        get_block_info(cons),
        C=C,
        omega_p=100.0,
        omega_d=100.0,
        maxiterations=200,
        verbose=False,
    )
    assert res.converged, res.status
    assert abs(res.primal_objective - 2.3) < 1e-10
    assert abs(res.dual_objective - 2.3) < 1e-10
    x = np.asarray(res.x.to_float64()).ravel()
    assert abs(x[0] - 0.7) < 1e-8 and abs(x[1] - 0.3) < 1e-8
    # X = diag(0.5, 0) at the optimum
    X00 = np.asarray(res.X[0][0].to_float64())
    assert abs(X00[0, 0] - 0.5) < 1e-7 and abs(X00[1, 1]) < 1e-7


def test_nonzero_C_with_b0_offset():
    """b0 shifts both objectives identically (MPMP.jl:1029-1034)."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [make_lp_constraint(vs, [[1.0], [1.0]], [2.0, 3.0])]
    C = [[np.array([[0.2, 0.0], [0.0, 0.3]], dtype=object)]]
    res = solverank1sdp(
        cons,
        [1.0],
        get_block_info(cons),
        C=C,
        b0=10.0,
        omega_p=100.0,
        omega_d=100.0,
        maxiterations=200,
        verbose=False,
    )
    assert res.converged, res.status
    assert abs(res.primal_objective - 12.3) < 1e-9
    assert abs(res.dual_objective - 12.3) < 1e-9


def test_classify_failure_overflow_vs_spd():
    """f32 exponent-range overflow is reported distinctly from a genuine
    not-SPD factorization failure (TODO f32 range guard)."""
    import jax.numpy as jnp

    from clrs_tpu.core.solver import classify_failure
    from clrs_tpu.ops.xfloat import XF

    finite = XF(jnp.ones((2, 3, 3)))
    assert classify_failure("Xinv", [ [finite] ]) == "numerical_failure:Xinv"
    bad = XF(jnp.full((2, 3, 3), jnp.inf))
    assert classify_failure("Xinv", [[finite]], [[bad]]) == "overflow:Xinv"
    nan = XF(jnp.full((2, 3, 3), jnp.nan))
    assert classify_failure("schur_factorization", [[nan]]) == (
        "overflow:schur_factorization"
    )


def test_f32_overflow_exits_cleanly():
    """An f32-limb solve whose iterates overflow the f32 exponent range
    must exit with a terminal status (overflow:* / stalled / failure),
    never hang or raise — the guard contract (reference needs none:
    BigFloat exponent is unbounded, MPMP.jl:17)."""
    from clrs_tpu.core.problem import pack_constraints

    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [make_lp_constraint(vs, [[1.0], [1.0]], [2.0, 3.0])]
    problem = pack_constraints(
        cons, [1.0], info=get_block_info(cons), k=2, dtype=np.float32
    )
    res = solverank1sdp(
        problem=problem,
        omega_p=1e20, omega_d=1e20,  # <X,Y> ~ 1e40 > f32 max
        maxiterations=60, verbose=False,
    )
    assert res.status != "max_iterations" or not res.converged
    assert res.status in (
        "overflow:Xinv", "overflow:schur_factorization",
        "overflow:steplength", "stalled",
        "numerical_failure:Xinv", "numerical_failure:schur_factorization",
        "numerical_failure:steplength", "max_iterations",
    ), res.status


def test_split_direction_matches_one_phase():
    """SolverConfig.split_direction (the high-k compile-budget mode) is
    the SAME computation as the one-phase direction — three composed
    stages, identical ops and association — so the solve trajectory is
    identical row-for-row."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [make_lp_constraint(vs, [[1.0], [1.0]], [2.0, 3.0])]
    hist = []
    for split in (False, True):
        res = solverank1sdp(
            cons, [1.0], get_block_info(cons), omega_p=100.0,
            omega_d=100.0, maxiterations=200, verbose=False,
            split_direction=split,
        )
        assert res.converged, res.status
        hist.append(res.history)
    assert len(hist[0]) == len(hist[1])
    for r0, r1 in zip(hist[0], hist[1]):
        for key in ("mu", "gap", "P_err", "p_err", "d_err", "alpha_p"):
            assert r0[key] == r1[key] or abs(r0[key] - r1[key]) <= (
                1e-12 * max(abs(r0[key]), 1e-300)
            ), (key, r0[key], r1[key])
