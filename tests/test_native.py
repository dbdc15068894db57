"""Native C++ dd host library vs mpmath oracles."""

import mpmath
import numpy as np
import pytest

from clrs_tpu import native

mpmath.mp.prec = 250

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native dd library unavailable"
)


def rand_mp(rng, shape):
    out = np.empty(shape, dtype=object)
    it = np.nditer(out, flags=["multi_index", "refs_ok"])
    for _ in it:
        out[it.multi_index] = mpmath.mpf(rng.standard_normal()) + mpmath.mpf(
            rng.standard_normal()
        ) * mpmath.mpf(2) ** -40
    return out


def merr(got_dd, want_mp):
    got = native.from_dd(got_dd)
    return max(
        abs(g - w)
        for g, w in zip(np.asarray(got).ravel(), np.asarray(want_mp).ravel())
    )


def test_dd_matmul():
    rng = np.random.default_rng(0)
    A = rand_mp(rng, (7, 5))
    B = rand_mp(rng, (5, 6))
    C = native.dd_matmul(native.to_dd(A), native.to_dd(B))
    assert merr(C, A @ B) < 1e-28


def test_dd_gram_cholesky_solve():
    rng = np.random.default_rng(1)
    V = rand_mp(rng, (6, 9))
    G = native.dd_gram(native.to_dd(V))
    G_mp = V @ V.T
    assert merr(G, G_mp) < 1e-27
    L, ok = native.dd_cholesky(G)
    assert ok
    L_mp = native.from_dd(L)
    rec = L_mp @ L_mp.T
    assert max(abs(a - b) for a, b in zip(rec.ravel(), G_mp.ravel())) < 1e-27
    # triangular solve
    B = rand_mp(rng, (6, 2))
    X = native.dd_solve_tril(L, native.to_dd(B))
    rec2 = L_mp @ native.from_dd(X)
    assert max(abs(a - b) for a, b in zip(rec2.ravel(), B.ravel())) < 1e-26


def test_dd_qr():
    rng = np.random.default_rng(2)
    A = rand_mp(rng, (10, 4))
    Q, R, ok = native.dd_qr(native.to_dd(A))
    assert ok
    Q_mp, R_mp = native.from_dd(Q), native.from_dd(R)
    rec = Q_mp @ R_mp
    assert max(abs(a - b) for a, b in zip(rec.ravel(), A.ravel())) < 1e-27
    # orthonormal columns
    QtQ = Q_mp.T @ Q_mp
    for i in range(4):
        for j in range(4):
            want = 1 if i == j else 0
            assert abs(QtQ[i, j] - want) < 1e-27


def test_dd_polyval():
    rng = np.random.default_rng(3)
    coeffs = rand_mp(rng, (6,))
    pts = rand_mp(rng, (5,))
    out = native.dd_polyval(native.to_dd(coeffs), native.to_dd(pts))
    got = native.from_dd(out)
    for g, x in zip(got, pts):
        want = sum(coeffs[c] * x**c for c in range(6))
        assert abs(g - want) < 1e-27
