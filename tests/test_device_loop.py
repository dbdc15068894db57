"""Device-resident solve loop (core/device_loop.py): the whole IPM as a
lax.while_loop, host touched once per chunk.  Must reproduce the phase-split
driver's results (same math, different dispatch shape)."""

import numpy as np

from clrs_tpu.core.blockinfo import get_block_info
from clrs_tpu.core.device_loop import solve_on_device
from clrs_tpu.core.problem import pack_constraints
from tests.test_solver_small import make_lp_constraint


def test_device_loop_lp():
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [make_lp_constraint(vs, [[1.0], [1.0]], [2.0, 3.0])]
    problem = pack_constraints(cons, [1.0], info=get_block_info(cons))
    res = solve_on_device(
        problem,
        omega_p=100.0, omega_d=100.0, maxiterations=200, verbose=False,
        chunk=16,
    )
    assert res.converged, res.status
    assert abs(res.primal_objective - 2.0) < 1e-10
    assert abs(res.dual_objective - 2.0) < 1e-10
    assert res.dual_gap < 1e-15
    x = np.asarray(res.x.to_float64()).ravel()
    assert abs(x[0] - 1.0) < 1e-8 and abs(x[1]) < 1e-8


def test_device_loop_multi_cluster_matches_host_driver():
    from clrs_tpu.core.solver import solverank1sdp

    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [
        make_lp_constraint(vs, [[1.0], [1.0]], [1.0, 2.0]),
        make_lp_constraint(vs, [[1.0], [1.0]], [3.0, 1.0]),
    ]
    info = get_block_info(cons)
    problem = pack_constraints(cons, [1.0], info=info)
    res_dev = solve_on_device(
        problem, omega_p=100.0, omega_d=100.0, maxiterations=200,
        verbose=False, chunk=64,
    )
    res_host = solverank1sdp(
        problem=problem, omega_p=100.0, omega_d=100.0, maxiterations=200,
        verbose=False,
    )
    assert res_dev.converged and res_host.converged
    # same math, same iterate path: objectives agree to full precision
    assert abs(res_dev.primal_objective - res_host.primal_objective) < 1e-14
    assert res_dev.iterations == res_host.iterations
