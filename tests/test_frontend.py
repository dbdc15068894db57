"""Front-end layer tests: polynomials, bases, sample points, prepareabc.

Golden values computed independently with mpmath (SURVEY.md §4: golden
tests for prepareabc outputs).
"""

import mpmath
import numpy as np
import pytest

from clrs_tpu.core.blockinfo import get_block_info
from clrs_tpu.models.bases import (
    gegenbauer_basis,
    jacobi_basis,
    laguerrebasis,
    make_monomial_basis,
)
from clrs_tpu.models.poly import MPoly, poly_matrix
from clrs_tpu.models.prepare import prepareabc
from clrs_tpu.models.samples import (
    create_sample_points,
    create_sample_points_1d,
    create_sample_points_2d,
    create_sample_points_chebyshev,
    create_sample_points_chebyshev_mod,
)

mpmath.mp.prec = 200


def test_mpoly_arithmetic():
    x = MPoly.var(0, 1)
    p = (x + 1) * (x - 1)
    assert p.total_degree() == 2
    assert p(mpmath.mpf(3)) == 8
    q = x**3 - x
    assert q(2) == 6
    # multivariate
    x0, x1 = MPoly.gens(2)
    r = x0 * x1 + x0**2
    assert r(2, 3) == 10
    assert r.total_degree() == 2


def test_laguerre_basis_values():
    """L_k^alpha(x) against mpmath.laguerre."""
    x = MPoly.var(0, 1)
    alpha = mpmath.mpf(1) / 2
    basis = laguerrebasis(5, alpha, x)
    for k in range(6):
        for t in [mpmath.mpf("0.3"), mpmath.mpf(2), mpmath.mpf("7.5")]:
            want = mpmath.laguerre(k, alpha, t)
            got = basis[k](t)
            assert abs(got - want) < abs(want) * mpmath.mpf(2) ** -180 + mpmath.mpf(2) ** -180


def test_gegenbauer_normalized_at_one():
    x = MPoly.var(0, 1)
    basis = gegenbauer_basis(6, 8, x)
    for p in basis:
        assert abs(p(mpmath.mpf(1)) - 1) < mpmath.mpf(2) ** -150


def test_gegenbauer_vs_mpmath():
    """G_k normalized: gegenbauer(k, lambda, t)/gegenbauer(k, lambda, 1)
    with lambda = n/2 - 1."""
    n = 5
    lam = mpmath.mpf(n) / 2 - 1
    x = MPoly.var(0, 1)
    basis = gegenbauer_basis(5, n, x)
    for k in range(1, 6):
        for t in [mpmath.mpf("-0.4"), mpmath.mpf("0.25")]:
            want = mpmath.gegenbauer(k, lam, t) / mpmath.gegenbauer(k, lam, mpmath.mpf(1))
            got = basis[k](t)
            assert abs(got - want) < mpmath.mpf(2) ** -150


def test_jacobi_basis_recurrence_consistency():
    x = MPoly.var(0, 1)
    basis = jacobi_basis(4, mpmath.mpf(1), mpmath.mpf(2), x)
    assert len(basis) == 5
    assert basis[0](5) == 1
    assert basis[1](mpmath.mpf("0.7")) == mpmath.mpf("0.7")


def test_monomial_basis_count():
    basis = make_monomial_basis(3, 2)
    assert len(basis) == 10  # (3+2 choose 2)
    degs = [p.total_degree() for p in basis]
    assert degs == sorted(degs)


def test_sample_point_counts():
    assert len(create_sample_points(2, 3)) == 10
    assert len(create_sample_points_2d(4)) == 15  # (4+2)(4+1)/2
    assert len(create_sample_points_chebyshev(6)) == 7
    assert len(create_sample_points_1d(6)) == 7


def test_chebyshev_points_are_roots():
    pts = create_sample_points_chebyshev(4)
    for p in pts:
        assert abs(mpmath.chebyt(5, p)) < mpmath.mpf(2) ** -150


def test_rescaled_laguerre_formula():
    # x_k = -sqrt(pi)/(64(d+1) log(3-2 sqrt 2)) (-1+4k)^2 (MPMP.jl:173-182)
    d = 3
    pts = create_sample_points_1d(d)
    c = -mpmath.sqrt(mpmath.pi) / (64 * (d + 1) * mpmath.log(3 - 2 * mpmath.sqrt(2)))
    for k in range(d + 1):
        assert abs(pts[k] - c * (4 * k - 1) ** 2) < mpmath.mpf(2) ** -150


def _simple_constraint(deg=2, n_y=2):
    """1x1 constraint: M0 = 1 - x^2, M_i = x^(i-1) * basis stuff."""
    x = MPoly.var(0, 1)
    one = MPoly.constant(1, 1)
    M = [poly_matrix([[one - x * x]])] + [
        poly_matrix([[x**i]]) for i in range(n_y)
    ]
    G = [one, x]
    q = [one, x]
    pts = create_sample_points_chebyshev(deg, 0, 1)
    return M, G, q, pts


def test_prepareabc_structure_and_values():
    M, G, q, pts = _simple_constraint()
    A, B, c, H = prepareabc(M, G, q, pts, 4)
    K = len(pts)
    assert len(A) == 2 and len(A[0]) == K
    # no Pi: rank 1 everywhere
    for l in range(2):
        for k in range(K):
            assert len(A[l][k]) == 1
            assert len(H[l][k]) == 1
    # weight l=0 (G=1): v_d = q_d(x_k) * sqrt(|1|), cut at delta/2 = 2 -> len(q)=2
    for k, pt in enumerate(pts):
        v = A[0][k][0]
        assert len(v) == 2
        assert abs(v[0] - 1) < mpmath.mpf(2) ** -150
        assert abs(v[1] - pt) < mpmath.mpf(2) ** -150
        assert H[0][k][0] == 1
    # weight l=1 (G=x on [0,1]: positive): v_d = q_d * sqrt(x_k), cut at
    # (4-1)//2 = 1 -> 2 basis elements with degree <= 1 -> len 2
    for k, pt in enumerate(pts):
        v = A[1][k][0]
        assert abs(v[0] - mpmath.sqrt(pt)) < mpmath.mpf(2) ** -140
    # B row for tuple (0,0,k): [-M_i(x_k)] for i >= 1
    for k, pt in enumerate(pts):
        assert abs(B[k, 0] + 1) < mpmath.mpf(2) ** -150  # -x^0
        assert abs(B[k, 1] + pt) < mpmath.mpf(2) ** -150  # -x^1
        assert abs(c[k] - (1 - pt * pt)) < mpmath.mpf(2) ** -150


def test_prepareabc_negative_weight_sign():
    """G < 0 at a sample flips H to -1 and uses sqrt(|G|)."""
    x = MPoly.var(0, 1)
    one = MPoly.constant(1, 1)
    M = [poly_matrix([[one]]), poly_matrix([[x]])]
    G = [x]  # negative at x = -2
    q = [one]
    pts = [mpmath.mpf(-2)]
    A, B, c, H = prepareabc(M, G, q, pts, 0)
    assert H[0][0][0] == -1
    assert abs(A[0][0][0][0] - mpmath.sqrt(2)) < mpmath.mpf(2) ** -150


def test_prepareabc_with_pi_symmetry():
    """Pi eigen-decomposition path: Pi = diag(1, 4) constantly."""
    x = MPoly.var(0, 1)
    one = MPoly.constant(1, 1)
    zero = MPoly.constant(0, 1)
    four = MPoly.constant(4, 1)
    M = [poly_matrix([[one]]), poly_matrix([[x]])]
    G = [one]
    q = [one, x]
    Pi = [poly_matrix([[one, zero], [zero, four]])]
    pts = [mpmath.mpf(1), mpmath.mpf(2)]
    A, B, c, H = prepareabc(M, G, q, pts, 2, Pi=Pi)
    # two eigenvalues (1 and 4) -> rank 2 per sample
    assert len(A[0][0]) == 2
    ws = sorted(float(w) for w in H[0][0])
    assert abs(ws[0] - 1) < 1e-30 and abs(ws[1] - 4) < 1e-30
    # vectors are kron(q-part, eigvec component); eigvec components are e1/e2
    lens = {len(v) for v in A[0][0]}
    assert lens == {4}  # 2 Pi rows x 2 basis elements


def test_prepareabc_prunes_tiny_weights():
    x = MPoly.var(0, 1)
    one = MPoly.constant(1, 1)
    zero = MPoly.constant(0, 1)
    tiny = MPoly.constant(mpmath.mpf(10) ** -80, 1)
    M = [poly_matrix([[one]]), poly_matrix([[x]])]
    G = [one]
    q = [one]
    Pi = [poly_matrix([[one, zero], [zero, tiny]])]
    A, B, c, H = prepareabc(M, G, q, [mpmath.mpf(1)], 0, Pi=Pi)
    assert len(A[0][0]) == 1  # the 1e-80 eigenvalue is pruned (MPMP.jl:378-383)


def test_get_block_info_roundtrip():
    M, G, q, pts = _simple_constraint()
    cons = [prepareabc(M, G, q, pts, 4)]
    info = get_block_info(cons)
    assert info.J == 1
    assert info.n_y == 2
    assert info.m == (1,)
    assert info.L == (2,)
    assert info.n_samples == (len(pts),)
    assert info.dim_S == (len(pts),)
    assert info.delta[0] == (2, 2)
    assert info.rmax[0] == (1, 1)
