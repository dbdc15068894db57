"""Integer-sliced MXU matmul vs the reference expansion matmul and mpmath."""

import mpmath
import numpy as np
import pytest

from clrs_tpu.ops.mxu_matmul import xf_matmul_mxu
from clrs_tpu.ops.xfloat import XF, xf_from_mp, xf_matmul, xf_to_mp

mpmath.mp.prec = 300


def rand_mp_matrix(rng, n, m, scale_range=(-10, 10)):
    out = np.empty((n, m), dtype=object)
    for i in range(n):
        for j in range(m):
            v = mpmath.mpf(rng.standard_normal()) * mpmath.mpf(2) ** int(
                rng.integers(*scale_range)
            )
            v += mpmath.mpf(rng.standard_normal()) * mpmath.mpf(2) ** -45
            out[i, j] = v
    return out


@pytest.mark.parametrize("k", [2, 3])
def test_mxu_matmul_matches_mpmath(k):
    rng = np.random.default_rng(0)
    n, kk, m = 12, 17, 9
    A_mp = rand_mp_matrix(rng, n, kk)
    B_mp = rand_mp_matrix(rng, kk, m)
    A = xf_from_mp(A_mp, k=k)
    B = xf_from_mp(B_mp, k=k)
    C = xf_matmul_mxu(A, B)
    want = A_mp @ B_mp
    got = xf_to_mp(C)
    # error bound: K * rowscale * colscale * 2^(-7S+2)
    rowscale = [max(abs(v) for v in A_mp[i, :]) for i in range(n)]
    colscale = [max(abs(v) for v in B_mp[:, j]) for j in range(m)]
    S = {2: 16, 3: 24}[k]
    for i in range(n):
        for j in range(m):
            tol = kk * rowscale[i] * colscale[j] * mpmath.mpf(2) ** (-7 * S + 4)
            assert abs(got[i, j] - want[i, j]) <= tol + mpmath.mpf(2) ** -400, (i, j)


def test_mxu_matches_reference_matmul():
    rng = np.random.default_rng(1)
    n = 16
    A_mp = rand_mp_matrix(rng, n, n, scale_range=(-3, 3))
    B_mp = rand_mp_matrix(rng, n, n, scale_range=(-3, 3))
    A = xf_from_mp(A_mp, k=2)
    B = xf_from_mp(B_mp, k=2)
    C1 = xf_matmul(A, B)
    C2 = xf_matmul_mxu(A, B)
    d = np.abs(np.asarray(C1.to_float64()) - np.asarray(C2.to_float64()))
    scale = np.max(np.abs(np.asarray(C1.to_float64())))
    assert np.max(d) < scale * 1e-28


def test_mxu_matmul_zero_rows():
    A = XF.zeros((4, 5), k=2)
    B = XF.from_float(np.ones((5, 3)), k=2)
    C = xf_matmul_mxu(A, B)
    assert np.all(np.asarray(C.limbs) == 0)


def test_solver_with_mxu_matmul_matches_default():
    """End-to-end IPM with use_mxu_matmul=True: the integer-sliced MXU path
    wired through pairings/weighted-A/trace (SolverConfig.use_mxu_matmul)
    reproduces the default VPU-expansion solve to double-double accuracy."""
    from clrs_tpu.core.blockinfo import get_block_info
    from clrs_tpu.core.solver import solverank1sdp

    vs = [np.array([1.0, 0.3]), np.array([-0.2, 1.0])]
    A = [[[v] for v in vs]]
    H = [[[1.0], [1.0]]]
    cons = [(A, np.asarray([[1.0], [2.0]], dtype=object),
             np.asarray([1.0, 1.0], dtype=object), H)]
    kwargs = dict(omega_p=100.0, omega_d=100.0, maxiterations=200,
                  verbose=False, duality_gap_threshold=1e-12,
                  primal_error_threshold=1e-24, dual_error_threshold=1e-24)
    res_ref = solverank1sdp(cons, [1.0], get_block_info(cons), **kwargs)
    res_mxu = solverank1sdp(cons, [1.0], get_block_info(cons),
                            use_mxu_matmul=True, **kwargs)
    assert res_ref.converged and res_mxu.converged, (res_ref.status, res_mxu.status)
    assert abs(res_ref.primal_objective - res_mxu.primal_objective) < 1e-12
