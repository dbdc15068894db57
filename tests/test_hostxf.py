"""Native k-limb host kernels (native/xfkern.cpp via core/hostxf.py)
against mpmath oracles.

This layer is the high-k (>= 9 limbs ~ 477+ bits) replacement for the
reference's Arb matrix kernels (SURVEY.md §2.9) where the XLA expansion
path's compile cost explodes; accuracy must match ops/xfloat.py's proven
cascades (same algorithms).
"""

import mpmath
import numpy as np
import pytest

from clrs_tpu.core.hostxf import (
    HXF,
    hxf_cholesky,
    hxf_dot,
    hxf_inverse_lu,
    hxf_lu,
    hxf_lu_solve,
    hxf_matmul,
    hxf_min_eig_sym,
    hxf_solve_tril,
    hxf_solve_triu,
    hxf_spd_inverse,
    hxf_sum,
    hxf_sym,
)

KS = [2, 3, 5, 8, 10, 12]


def _rand_mp(rng, shape, span=40):
    """Full-significand random mpmath values across ~2^span scales."""
    mpmath.mp.prec = 1400
    out = np.empty(shape, dtype=object)
    flat = out.reshape(-1)
    for i in range(flat.size):
        v = mpmath.mpf(0)
        for _ in range(30):  # ~30*53 bits of significand
            v = v + mpmath.mpf(float(rng.uniform(-1, 1))) * mpmath.mpf(2) ** int(
                rng.integers(-span, span) - 53 * (_ + 1) // 2
            )
        flat[i] = v + mpmath.mpf(float(rng.uniform(-1, 1))) * mpmath.mpf(2) ** int(
            rng.integers(-span // 2, span // 2)
        )
    return out


@pytest.mark.parametrize("k", KS)
def test_elementwise_vs_mpmath(k):
    mpmath.mp.prec = 1400
    rng = np.random.default_rng(k)
    a_mp = _rand_mp(rng, (3, 4))
    b_mp = _rand_mp(rng, (3, 4))
    a = HXF.from_mp(a_mp, k=k)
    b = HXF.from_mp(b_mp, k=k)
    eps = mpmath.mpf(2) ** (-53 * k + 12)
    for got, want in [
        ((a + b).to_mp(), a_mp + b_mp),
        ((a - b).to_mp(), a_mp - b_mp),
        ((a * b).to_mp(), a_mp * b_mp),
        ((a / b).to_mp(), a_mp / b_mp),
    ]:
        for g, w in zip(got.ravel(), want.ravel()):
            err = abs(g - w) / (abs(w) + mpmath.mpf(2) ** -1300)
            assert err < eps, (k, float(err), float(eps))
    s = (a * a).sqrt().to_mp()
    for g, w in zip(s.ravel(), np.abs(a_mp).ravel()):
        assert abs(g - w) / abs(w) < eps


@pytest.mark.parametrize("k", KS)
def test_matmul_dot_sum_vs_mpmath(k):
    mpmath.mp.prec = 1400
    rng = np.random.default_rng(100 + k)
    a_mp = _rand_mp(rng, (4, 5), span=20)
    b_mp = _rand_mp(rng, (5, 3), span=20)
    a = HXF.from_mp(a_mp, k=k)
    b = HXF.from_mp(b_mp, k=k)
    C = hxf_matmul(a, b).to_mp()
    eps = mpmath.mpf(2) ** (-53 * k + 16)
    for i in range(4):
        for j in range(3):
            w = mpmath.fsum(a_mp[i, t] * b_mp[t, j] for t in range(5))
            assert abs(C[i, j] - w) / (abs(w) + mpmath.mpf(2) ** -1300) < eps
    # transposed forms
    Ct = hxf_matmul(a.T, b, ta=True).to_mp()
    for i in range(4):
        for j in range(3):
            assert Ct[i, j] == C[i, j]
    d = hxf_dot(a.reshape((20,)), a.reshape((20,))).to_mp()[()]
    w = mpmath.fsum(v * v for v in a_mp.ravel())
    assert abs(d - w) / abs(w) < eps
    s = hxf_sum(a).to_mp()[()]
    w = mpmath.fsum(a_mp.ravel())
    assert abs(s - w) / (abs(w) + mpmath.mpf(2) ** -1300) < eps


@pytest.mark.parametrize("k", [2, 5, 10])
def test_cholesky_solves_inverse(k):
    mpmath.mp.prec = 1400
    rng = np.random.default_rng(7 + k)
    n = 6
    a_mp = _rand_mp(rng, (n, n), span=10)
    # SPD Gram with a wide diagonal spread (conditioning stressor)
    g_mp = np.empty((n, n), dtype=object)
    for i in range(n):
        for j in range(n):
            g_mp[i, j] = mpmath.fsum(a_mp[i, t] * a_mp[j, t] for t in range(n))
        g_mp[i, i] = g_mp[i, i] + mpmath.mpf(2) ** int(20 - 6 * i)
    G = HXF.from_mp(g_mp, k=k)
    L, ok = hxf_cholesky(G)
    assert ok
    # reconstruction
    R = hxf_matmul(L, L.T).to_mp()
    eps = mpmath.mpf(2) ** (-53 * k + 30)
    scale = max(abs(v) for v in g_mp.ravel())
    for g, w in zip(R.ravel(), g_mp.ravel()):
        assert abs(g - w) <= eps * scale
    # SPD inverse: G @ Ginv ~ I
    Gi, ok = hxf_spd_inverse(G)
    assert ok
    I = hxf_matmul(G, Gi).to_mp()
    # cond(G) eats precision: allow cond * eps
    for i in range(n):
        for j in range(n):
            want = 1 if i == j else 0
            assert abs(I[i, j] - want) < mpmath.mpf(2) ** (-53 * k + 160)
    # LU path agrees
    Gi2, ok = hxf_inverse_lu(G)
    assert ok
    for g, w in zip(Gi2.to_mp().ravel(), Gi.to_mp().ravel()):
        assert abs(g - w) <= mpmath.mpf(2) ** (-53 * k + 160) * abs(
            w if w != 0 else 1
        )
    # triangular solves roundtrip
    b_mp = _rand_mp(rng, (n, 2), span=5)
    B = HXF.from_mp(b_mp, k=k)
    Y = hxf_solve_tril(L, B)
    Br = hxf_matmul(L, Y).to_mp()
    bscale = max(abs(v) for v in b_mp.ravel())
    for g, w in zip(Br.ravel(), b_mp.ravel()):
        assert abs(g - w) < mpmath.mpf(2) ** (-53 * k + 60) * bscale
    X = hxf_solve_tril(L, Y, trans=True)
    GX = hxf_matmul(G, X).to_mp()
    for g, w in zip(GX.ravel(), b_mp.ravel()):
        assert abs(g - w) < mpmath.mpf(2) ** (-53 * k + 160) * bscale


@pytest.mark.parametrize("k", [2, 10])
def test_lu_pivoting(k):
    """A matrix that requires pivoting (zero leading pivot)."""
    mpmath.mp.prec = 1400
    a_mp = np.array(
        [
            [mpmath.mpf(0), mpmath.mpf(2), mpmath.mpf(1)],
            [mpmath.mpf(1), mpmath.mpf("1e-30"), mpmath.mpf(3)],
            [mpmath.mpf(4), mpmath.mpf(5), mpmath.mpf("1e-25")],
        ],
        dtype=object,
    )
    A = HXF.from_mp(a_mp, k=k)
    LU, perm, ok = hxf_lu(A)
    assert ok
    b_mp = np.array([[mpmath.mpf(1)], [mpmath.mpf(2)], [mpmath.mpf(3)]], dtype=object)
    B = HXF.from_mp(b_mp, k=k)
    X = hxf_lu_solve(LU, perm, B)
    AX = hxf_matmul(A, X).to_mp()
    for g, w in zip(AX.ravel(), b_mp.ravel()):
        assert abs(g - w) < mpmath.mpf(2) ** (-53 * k + 40)


def test_cholesky_not_spd_flags():
    A = HXF.from_float(np.array([[1.0, 2.0], [2.0, 1.0]]), k=3)  # indefinite
    _, ok = hxf_cholesky(A)
    assert not ok
    _, ok2 = hxf_spd_inverse(A)
    assert not ok2


def test_min_eig_sym():
    """lambda_min(L^-1 dM L^-T) against numpy on an easy f64 case."""
    rng = np.random.default_rng(3)
    n = 5
    a = rng.standard_normal((n, n))
    M64 = a @ a.T + 10 * np.eye(n)
    dM64 = rng.standard_normal((n, n))
    dM64 = (dM64 + dM64.T) / 2
    M = HXF.from_float(M64, k=5)
    dM = HXF.from_float(dM64, k=5)
    lam, ok = hxf_min_eig_sym(M, dM)
    assert ok
    L = np.linalg.cholesky(M64)
    W = np.linalg.solve(L, dM64)
    lml = np.linalg.solve(L, W.T)
    want = np.min(np.linalg.eigvalsh((lml + lml.T) / 2))
    assert abs(lam - want) < 1e-10 * max(1.0, abs(want))


@pytest.mark.parametrize("k", [5, 10])
def test_matches_jax_xf_limbs(k):
    """Bit-identical limbs vs the proven ops/xfloat.py cascades (same
    algorithms, different engines).  Only k in 5..12 qualifies: xfloat
    dispatches k<=4 to hand-written _dd/_td/_qw sequences instead."""
    import jax

    from clrs_tpu.ops.xfloat import xf_add, xf_from_mp, xf_mul

    mpmath.mp.prec = 1400
    rng = np.random.default_rng(17)
    a_mp = _rand_mp(rng, (8,), span=25)
    b_mp = _rand_mp(rng, (8,), span=25)
    ax = xf_from_mp(a_mp, k=k)
    bx = xf_from_mp(b_mp, k=k)
    ah = HXF.from_mp(a_mp, k=k)
    bh = HXF.from_mp(b_mp, k=k)
    np.testing.assert_array_equal(
        np.asarray(xf_add(ax, bx).limbs), (ah + bh).limbs
    )
    np.testing.assert_array_equal(
        np.asarray(xf_mul(ax, bx).limbs), (ah * bh).limbs
    )


@pytest.mark.parametrize("k", [2, 5, 10])
def test_wide_kernels_cover_avx_lanes(k):
    """Outputs >= 8 wide (plus non-multiple-of-8 tails) so the AVX-512
    8-lane vector bodies of gemm/cholesky/trsm/LU execute, not just the
    scalar tails (round-2 advice: the earlier sizes n<=6 stayed below the
    vector threshold, leaving the lane kernels untested here)."""
    mpmath.mp.prec = 1400
    rng = np.random.default_rng(900 + k)
    eps = mpmath.mpf(2) ** (-53 * k + 16)
    tiny = mpmath.mpf(2) ** -1300

    # gemm 13x17x29: vector body (3x8 lanes) + 5-wide tail
    a_mp = _rand_mp(rng, (13, 17), span=15)
    b_mp = _rand_mp(rng, (17, 29), span=15)
    A = HXF.from_mp(a_mp, k=k)
    B = HXF.from_mp(b_mp, k=k)
    C = hxf_matmul(A, B).to_mp()
    for i in range(13):
        for j in range(29):
            w = mpmath.fsum(a_mp[i, t] * b_mp[t, j] for t in range(17))
            assert abs(C[i, j] - w) / (abs(w) + tiny) < eps, (k, i, j)

    # Cholesky / trsm / SPD inverse / LU at n=18 (two vector rows + tail)
    n = 18
    base = _rand_mp(rng, (n, n), span=8)
    g_mp = np.empty((n, n), dtype=object)
    for i in range(n):
        for j in range(n):
            g_mp[i, j] = mpmath.fsum(base[i, t] * base[j, t] for t in range(n))
        g_mp[i, i] = g_mp[i, i] + mpmath.mpf(2) ** int(16 - i)
    G = HXF.from_mp(g_mp, k=k)
    L, ok = hxf_cholesky(G)
    assert ok
    R = hxf_matmul(L, L.T).to_mp()
    scale = max(abs(v) for v in g_mp.ravel())
    for g, w in zip(R.ravel(), g_mp.ravel()):
        assert abs(g - w) <= mpmath.mpf(2) ** (-53 * k + 30) * scale

    b2_mp = _rand_mp(rng, (n, 12), span=5)
    B2 = HXF.from_mp(b2_mp, k=k)
    Y = hxf_solve_tril(L, B2)
    Br = hxf_matmul(L, Y).to_mp()
    bscale = max(abs(v) for v in b2_mp.ravel())
    for g, w in zip(Br.ravel(), b2_mp.ravel()):
        assert abs(g - w) < mpmath.mpf(2) ** (-53 * k + 60) * bscale
    X = hxf_solve_tril(L, Y, trans=True)
    GX = hxf_matmul(G, X).to_mp()
    for g, w in zip(GX.ravel(), b2_mp.ravel()):
        assert abs(g - w) < mpmath.mpf(2) ** (-53 * k + 170) * bscale

    LU, perm, ok = hxf_lu(G)
    assert ok
    XL = hxf_lu_solve(LU, perm, B2)
    GXL = hxf_matmul(G, XL).to_mp()
    for g, w in zip(GXL.ravel(), b2_mp.ravel()):
        assert abs(g - w) < mpmath.mpf(2) ** (-53 * k + 170) * bscale


@pytest.mark.parametrize("k,p,n", [(2, 5, 4), (5, 13, 17), (10, 9, 23)])
def test_syrk_matches_gemm_upper_and_symmetric(k, p, n):
    """xk_syrk: upper triangle bit-identical to gemm(a, a, ta=True),
    exactly symmetric output (the gemm's lower triangle recomputes
    commuted products and may differ in low limbs — syrk mirrors)."""
    from clrs_tpu.core.hostxf import hxf_syrk

    mpmath.mp.prec = 1400
    rng = np.random.default_rng(70 + k)
    a_mp = _rand_mp(rng, (p, n), span=10)
    A = HXF.from_mp(a_mp, k=k)
    C = hxf_syrk(A)
    G = hxf_matmul(A, A, ta=True)
    # upper triangle (incl. diagonal): bit-identical to the gemm
    for i in range(n):
        for j in range(i, n):
            np.testing.assert_array_equal(
                C.limbs[:, i, j], G.limbs[:, i, j], err_msg=f"({i},{j})")
    # exact symmetry
    np.testing.assert_array_equal(
        C.limbs, np.swapaxes(C.limbs, 1, 2))
    # value correctness vs mpmath
    eps = mpmath.mpf(2) ** (-53 * k + 16)
    Cm = C.to_mp()
    for i in range(n):
        for j in range(i, n):
            w = mpmath.fsum(a_mp[t, i] * a_mp[t, j] for t in range(p))
            assert abs(Cm[i, j] - w) / (abs(w) + mpmath.mpf(2) ** -1300) \
                < eps, (i, j)
