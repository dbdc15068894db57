"""End-to-end tests for the host high-precision IPM (core/host_solver.py).

This path is the 512-bit-equivalent regime (k ~ 10 f64 limbs) the
reference runs by default (MPMP.jl:17; setprecision(512),
examples/SpherePacking.jl:29-31), executed through the native k-limb
kernels with no XLA in the loop.  The contract it must reach is the
reference's default: gap < 1e-15 AND P/p/d errors < 1e-30 SIMULTANEOUSLY
(MPMP.jl:607-609).
"""

import mpmath
import numpy as np
import pytest

from clrs_tpu.core.blockinfo import get_block_info
from clrs_tpu.core.host_solver import solverank1sdp_host


def make_lp_constraint(vs, B, c):
    K = len(vs)
    A = [[[np.asarray(v, dtype=object).reshape(-1)] for v in vs]]
    H = [[[1.0] for _ in range(K)]]
    return (A, np.asarray(B, dtype=object), np.asarray(c, dtype=object), H)


def test_lp_full_contract_k10():
    """Tiny LP-as-SDP at k=10 (~530 bits): the FULL reference contract,
    gap < 1e-15 and errors < 1e-30 simultaneously."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [make_lp_constraint(vs, [[1.0], [1.0]], [2.0, 3.0])]
    res = solverank1sdp_host(
        cons, [1.0], get_block_info(cons), precision_k=10,
        omega_p=100.0, omega_d=100.0, maxiterations=200, verbose=False,
    )
    assert res.converged and res.status == "optimal", res.status
    assert abs(res.primal_objective - 2.0) < 1e-10
    row = res.history[-1]
    assert row["gap"] < 1e-15
    assert max(row["P_err"], row["p_err"]) < 1e-30
    assert row["d_err"] < 1e-30
    # residuals returned
    assert res.P is not None and res.p is not None and res.d is not None
    assert res.p.max_abs() < 1e-30


def test_lp_nonzero_C_k4():
    """C != 0 + b0 on the host path (MPMP.jl:589-592): optimum 12.3."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [make_lp_constraint(vs, [[1.0], [1.0]], [2.0, 3.0])]
    C = [[np.array([[0.2, 0.0], [0.0, 0.3]], dtype=object)]]
    res = solverank1sdp_host(
        cons, [1.0], get_block_info(cons), C=C, b0=10.0, precision_k=4,
        omega_p=100.0, omega_d=100.0, maxiterations=200, verbose=False,
    )
    assert res.converged, res.status
    assert abs(res.primal_objective - 12.3) < 1e-9
    assert abs(res.dual_objective - 12.3) < 1e-9
    x = res.x.to_float64().ravel()
    assert abs(x[0] - 0.7) < 1e-7 and abs(x[1] - 0.3) < 1e-7


@pytest.fixture(scope="module")
def delsarte_cons():
    """Delsarte dim-8 2d=6 constraint data (the 240-sharp kissing config),
    built at high mpmath precision, shared across tests."""
    from clrs_tpu.models.bases import gegenbauer_basis
    from clrs_tpu.models.poly import MPoly, poly_matrix
    from clrs_tpu.models.prepare import prepareabc
    from clrs_tpu.models.samples import create_sample_points_chebyshev

    mpmath.mp.prec = 700
    d = 3
    n = 8
    deg = 2 * d
    x = MPoly.var(0, 1)
    gb = gegenbauer_basis(deg, n, x)
    M_main = [poly_matrix([[MPoly.constant(-1, 1)]])] + [
        poly_matrix([[-gb[kk]]]) for kk in range(1, deg + 1)
    ]
    ct = mpmath.mpf("0.5")
    G_main = [MPoly.constant(1, 1), (x + 1) * (MPoly.constant(ct, 1) - x)]
    q_main = gegenbauer_basis(d, n, x)
    pts = create_sample_points_chebyshev(deg, -1, ct)
    cons = [prepareabc(M_main, G_main, q_main, pts, deg)]
    one = MPoly.constant(1, 1)
    zero = MPoly.constant(0, 1)
    for kk in range(1, deg + 1):
        Mj = [poly_matrix([[zero]])] + [
            poly_matrix([[one if i == kk else zero]]) for i in range(1, deg + 1)
        ]
        cons.append(prepareabc(Mj, [one], [one], [mpmath.mpf(0)], 0))
    b = [-1.0] * deg
    return cons, b


def test_delsarte_full_contract_host(delsarte_cons):
    """Delsarte dim-8 2d=6 at k=6 on the host path: kissing-number bound
    240 (sharp) to the FULL reference contract."""
    cons, b = delsarte_cons
    res = solverank1sdp_host(
        cons, b, get_block_info(cons), precision_k=6,
        omega_p=100.0, omega_d=100.0, maxiterations=250, verbose=False,
    )
    assert res.converged and res.status == "optimal", res.status
    bound = 1.0 - res.dual_objective  # bound = f(1) = 1 + sum y_k
    assert abs(bound - 240.0) < 1e-9, bound
    row = res.history[-1]
    assert row["gap"] < 1e-15
    assert max(row["P_err"], row["p_err"], row["d_err"]) < 1e-30


def test_host_matches_xla_trajectory(delsarte_cons):
    """First IPM iterations agree with the XLA solver at the same k
    (same algorithm, different engines; dd-ulp-level agreement)."""
    import jax

    import clrs_tpu.core.solver as S
    from clrs_tpu.core.problem import pack_constraints

    cons, b = delsarte_cons
    mpmath.mp.prec = 700
    info = get_block_info(cons)
    k = 3
    res_h = solverank1sdp_host(
        cons, b, info, precision_k=k,
        omega_p=100.0, omega_d=100.0, maxiterations=8, verbose=False,
    )
    problem = pack_constraints(cons, b, info=info, k=k)
    res_x = S.solverank1sdp(
        problem=problem, omega_p=100.0, omega_d=100.0, maxiterations=8,
        verbose=False,
    )
    for rh, rx in zip(res_h.history, res_x.history):
        assert abs(rh["mu"] - rx["mu"]) <= 1e-12 * abs(rx["mu"]) + 1e-300
        assert abs(rh["p_obj"] - rx["p_obj"]) <= (
            1e-9 * max(1.0, abs(rx["p_obj"]))
        )
        assert abs(rh["alpha_p"] - rx["alpha_p"]) < 1e-6
        assert abs(rh["alpha_d"] - rx["alpha_d"]) < 1e-6


def test_host_threads_bitwise_deterministic(delsarte_cons):
    """Threaded host solves (cluster pool, host_solver._JPool) are bitwise
    identical to serial: per-cluster work is independent and every
    reduction accumulates in fixed j order regardless of completion
    order (the determinism contract of the reference's @threads loops,
    made exact)."""
    cons, b = delsarte_cons
    info = get_block_info(cons)
    kw = dict(precision_k=6, omega_p=100.0, omega_d=100.0,
              maxiterations=40, verbose=False)
    r1 = solverank1sdp_host(cons, b, info, host_threads=1, **kw)
    r2 = solverank1sdp_host(cons, b, info, host_threads=2, **kw)
    np.testing.assert_array_equal(r1.x.limbs, r2.x.limbs)
    np.testing.assert_array_equal(r1.y.limbs, r2.y.limbs)
    for j in range(len(r1.X)):
        for l in range(len(r1.X[j])):
            np.testing.assert_array_equal(r1.X[j][l].limbs, r2.X[j][l].limbs)
            np.testing.assert_array_equal(r1.Y[j][l].limbs, r2.Y[j][l].limbs)
    assert [h["gap"] for h in r1.history] == [h["gap"] for h in r2.history]
