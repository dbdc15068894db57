"""Property tests for the float-expansion arithmetic vs an mpmath oracle.

SURVEY.md §4: "unit tests for every kernel against MPFR oracles" — mpmath is
the MPFR-equivalent here.
"""

import mpmath
import numpy as np
import pytest

from clrs_tpu.ops.xfloat import (
    XF,
    xf_abs,
    xf_add,
    xf_div,
    xf_dot,
    xf_from_mp,
    xf_lt,
    xf_matmul,
    xf_mul,
    xf_norm_max,
    xf_sqrt,
    xf_sum,
    xf_to_mp,
)

mpmath.mp.prec = 400


def rand_mp(rng, n, scale_range=(-20, 20)):
    """Random mpf values with wide dynamic range (exercises renorm)."""
    out = []
    for _ in range(n):
        m = mpmath.mpf(rng.standard_normal())
        e = int(rng.integers(*scale_range))
        extra = mpmath.mpf(rng.standard_normal()) * mpmath.mpf(2) ** (e - 40)
        out.append(m * mpmath.mpf(2) ** e + extra)
    return out


def ulp_bound(k):
    # K f64 limbs: unit roundoff ~ 2^-(53K - few bits slack)
    return mpmath.mpf(2) ** (-(53 * k - 6))


@pytest.mark.parametrize("k", [1, 2, 3, 4])
def test_roundtrip(k):
    rng = np.random.default_rng(0)
    vals = rand_mp(rng, 64)
    x = xf_from_mp(vals, k=k)
    back = xf_to_mp(x)
    for v, b in zip(vals, back):
        assert abs(b - v) <= abs(v) * ulp_bound(k) * 2 + mpmath.mpf(2) ** -1070


@pytest.mark.parametrize("k", [1, 2, 3, 4])
@pytest.mark.parametrize("op", ["add", "sub", "mul", "div"])
def test_binary_ops(k, op):
    rng = np.random.default_rng(hash((k, op)) % 2**32)
    a_mp = rand_mp(rng, 256)
    b_mp = rand_mp(rng, 256)
    a = xf_from_mp(a_mp, k=k)
    b = xf_from_mp(b_mp, k=k)
    if op == "add":
        c, ora = xf_add(a, b), [x + y for x, y in zip(a_mp, b_mp)]
    elif op == "sub":
        c, ora = xf_add(a, -b), [x - y for x, y in zip(a_mp, b_mp)]
    elif op == "mul":
        c, ora = xf_mul(a, b), [x * y for x, y in zip(a_mp, b_mp)]
    else:
        c, ora = xf_div(a, b), [x / y for x, y in zip(a_mp, b_mp)]
    got = xf_to_mp(c)
    tol = ulp_bound(k)
    # input representation error (2 ulp) + op error (few ulp)
    for g, o, x, y in zip(got, ora, a_mp, b_mp):
        scale = max(abs(o), abs(x), abs(y), mpmath.mpf(2) ** -200)
        if op == "div":
            scale = max(abs(o), mpmath.mpf(2) ** -200) * 4
        assert abs(g - o) <= scale * tol * 16, (g, o, abs(g - o) / scale)


@pytest.mark.parametrize("k", [2, 4])
def test_cancellation(k):
    """(a + tiny) - a must recover tiny to full precision."""
    a = XF.from_float(1.0, k=k)
    tiny = xf_from_mp([mpmath.mpf(2) ** -90], k=k)[0]
    s = xf_add(a, tiny)
    d = xf_add(s, -a)
    got = xf_to_mp(d)[()] if d.shape == () else xf_to_mp(d)
    want = mpmath.mpf(2) ** -90
    if k >= 2:
        assert abs(got - want) <= want * ulp_bound(k) * 4


@pytest.mark.parametrize("k", [1, 2, 4])
def test_sqrt(k):
    rng = np.random.default_rng(3)
    vals = [abs(v) for v in rand_mp(rng, 128)]
    a = xf_from_mp(vals, k=k)
    s = xf_sqrt(a)
    got = xf_to_mp(s)
    for g, v in zip(got, vals):
        o = mpmath.sqrt(v)
        assert abs(g - o) <= o * ulp_bound(k) * 16


def test_sqrt_zero():
    s = xf_sqrt(XF.zeros((3,), k=2))
    assert np.all(np.asarray(s.limbs) == 0)


@pytest.mark.parametrize("k", [2, 4])
def test_sum_ill_conditioned(k):
    """Tree sum of a vector with huge cancellation."""
    rng = np.random.default_rng(4)
    base = rand_mp(rng, 100, scale_range=(-5, 5))
    vals = base + [-v for v in base] + [mpmath.mpf(2) ** -80]
    rng.shuffle(vals)
    x = xf_from_mp(vals, k=k)
    s = xf_sum(x, axis=0)
    got = xf_to_mp(s)[()]
    want = mpmath.fsum(vals)
    assert abs(got - want) <= mpmath.mpf(2) ** (-53 * k + 30)


@pytest.mark.parametrize("k", [1, 2])
def test_matmul(k):
    rng = np.random.default_rng(5)
    n, m, p = 9, 7, 11
    A_mp = np.array(rand_mp(rng, n * m)).reshape(n, m)
    B_mp = np.array(rand_mp(rng, m * p)).reshape(m, p)
    A = xf_from_mp(A_mp, k=k)
    B = xf_from_mp(B_mp, k=k)
    C = xf_matmul(A, B)
    got = xf_to_mp(C)
    want = A_mp @ B_mp
    scale = max(abs(v) for v in np.asarray(want).ravel())
    for g, w in zip(np.asarray(got).ravel(), np.asarray(want).ravel()):
        assert abs(g - w) <= scale * ulp_bound(k) * m * 8


def test_dot():
    rng = np.random.default_rng(6)
    a_mp = rand_mp(rng, 97)
    b_mp = rand_mp(rng, 97)
    a = xf_from_mp(a_mp, k=2)
    b = xf_from_mp(b_mp, k=2)
    d = xf_dot(a, b)
    want = mpmath.fsum([x * y for x, y in zip(a_mp, b_mp)])
    got = xf_to_mp(d)[()]
    scale = mpmath.fsum([abs(x * y) for x, y in zip(a_mp, b_mp)])
    assert abs(got - want) <= scale * ulp_bound(2) * 64


def test_compare_and_abs():
    rng = np.random.default_rng(7)
    a_mp = rand_mp(rng, 64)
    b_mp = rand_mp(rng, 64)
    a = xf_from_mp(a_mp, k=2)
    b = xf_from_mp(b_mp, k=2)
    lt = np.asarray(xf_lt(a, b))
    for i in range(64):
        assert bool(lt[i]) == (a_mp[i] < b_mp[i])
    ab = xf_to_mp(xf_abs(a))
    for g, v in zip(ab, a_mp):
        assert g == abs(v) or abs(g - abs(v)) <= abs(v) * ulp_bound(2) * 2


def test_tiny_differences_compare():
    """Comparison must resolve differences far below f64 ulp."""
    a = xf_from_mp([mpmath.mpf(1) + mpmath.mpf(2) ** -80], k=2)
    b = xf_from_mp([mpmath.mpf(1)], k=2)
    assert bool(np.asarray(xf_lt(b, a))[0])
    assert not bool(np.asarray(xf_lt(a, b))[0])


def test_norm_max():
    rng = np.random.default_rng(8)
    vals = rand_mp(rng, 37)
    x = xf_from_mp(vals, k=2).reshape((37, 1))
    m = xf_norm_max(x)
    want = max(abs(v) for v in vals)
    got = xf_to_mp(m)[()]
    assert abs(got - want) <= want * ulp_bound(2) * 4


def test_jit_and_vmap():
    import jax

    rng = np.random.default_rng(9)
    a = xf_from_mp(rand_mp(rng, 32), k=2)
    b = xf_from_mp(rand_mp(rng, 32), k=2)

    f = jax.jit(lambda x, y: xf_mul(x, y))
    c1 = f(a, b)
    # jit may contract a*b-p into fma (exact), changing error terms bitwise
    # but not the represented value: compare against the oracle instead.
    got = xf_to_mp(c1)
    a_mp, b_mp = xf_to_mp(a), xf_to_mp(b)
    for g, x, y in zip(got, a_mp, b_mp):
        o = x * y
        assert abs(g - o) <= abs(o) * ulp_bound(2) * 8

    A = xf_from_mp(np.array(rand_mp(rng, 24)).reshape(4, 6), k=2)
    g = jax.vmap(lambda row: xf_sum(row, axis=0))
    s = g(A)
    assert s.shape == (4,)


def test_fast_path_canonical_leading_limb_after_cancellation():
    """Regression: the k=3/k=4 fast add/mul paths must return expansions
    with limbs[0] = fl(value).  Before the VecSum pull-up pass, exact
    cancellation of the two leading orders left the value stranded in
    limbs[1] with limbs[0] == 0 — downstream, LU pivot selection read
    |limbs[0]| = 0 and xf_reciprocal's 1/limbs[0] seed produced inf/NaN
    (the sphere-packing 2d=16 k=4 Schur factorization failure).

    Sets its own mpmath precision: the test values span 161 bits, and the
    ambient precision is whatever an earlier test left (order-fragile
    otherwise)."""
    import mpmath

    old = mpmath.mp.prec
    mpmath.mp.prec = 300
    try:
        for k, low in ((3, -90), (4, -120)):
            a = xf_from_mp(
                np.array([mpmath.mpf(2) ** 40 + mpmath.mpf(2) ** -30], dtype=object), k=k
            )
            b = xf_from_mp(
                np.array(
                    [-(mpmath.mpf(2) ** 40) - mpmath.mpf(2) ** -30 + mpmath.mpf(2) ** low],
                    dtype=object,
                ),
                k=k,
            )
            s = xf_add(a, b)
            lead = float(np.asarray(s.limbs)[0, 0])
            assert lead != 0.0, (k, np.asarray(s.limbs)[:, 0])
            assert abs(lead - 2.0**low) < 1e-3 * 2.0**low
    finally:
        mpmath.mp.prec = old


def test_generic_renorm_k5_newton_refinement_precision():
    """Regression: the generic (k>=5) add/mul renormalization must not
    lose the last limbs when a tiny correction's limbs interleave below a
    large value's (the Newton-refinement profile: x + x*(1-b*x)).  With a
    fixed VecSum pass count a displaced term migrates only one position
    per pass and k=5 division plateaued at ~1e-66; magnitude-sorting the
    terms first (exact permutation) restores full precision (~1e-80)."""
    import mpmath

    old = mpmath.mp.prec
    mpmath.mp.prec = 700
    try:
        rng = np.random.default_rng(0)
        vals = [
            mpmath.mpf(rng.standard_normal()) * mpmath.mpf(10) ** int(e)
            for e in rng.integers(-8, 8, 8)
        ]
        for k, tol in ((5, mpmath.mpf(10) ** -75), (6, mpmath.mpf(10) ** -90)):
            a = xf_from_mp(np.array(vals[:4], dtype=object), k=k)
            b = xf_from_mp(np.array(vals[4:], dtype=object), k=k)
            q = xf_div(a, b)
            L = np.asarray(q.limbs, np.float64)
            for i in range(4):
                got = mpmath.fsum([mpmath.mpf(float(L[j, i])) for j in range(k)])
                want = vals[i] / vals[4 + i]
                assert abs((got - want) / want) < tol, (k, i)
    finally:
        mpmath.mp.prec = old


@pytest.mark.parametrize("k", [9, 10])
def test_cascade_high_k(k):
    """k=9/10 limbs (~477/530 bits — the reference's 512-bit regime,
    MPMP.jl:17 + examples/SpherePacking.jl:29-31) through the cascade
    kernels: add/mul/div accuracy tracks ulp_bound(k)."""
    import mpmath

    old = mpmath.mp.prec
    mpmath.mp.prec = 1400
    try:
        rng = np.random.default_rng(k)
        a_mp = rand_mp(rng, 16)
        b_mp = rand_mp(rng, 16)
        a = xf_from_mp(a_mp, k=k)
        b = xf_from_mp(b_mp, k=k)
        tol = ulp_bound(k) * 64
        for got, x, y in zip(xf_to_mp(xf_mul(a, b)), a_mp, b_mp):
            o = x * y
            assert abs(got - o) <= abs(o) * tol, (got, o)
        for got, x, y in zip(xf_to_mp(xf_add(a, b)), a_mp, b_mp):
            o = x + y
            scale = max(abs(o), abs(x), abs(y))
            assert abs(got - o) <= scale * tol, (got, o)
        for got, x, y in zip(xf_to_mp(xf_div(a, b)), a_mp, b_mp):
            o = x / y
            assert abs(got - o) <= abs(o) * tol * 8, (got, o)
    finally:
        mpmath.mp.prec = old


@pytest.mark.parametrize("ka,kb", [(2, 3), (3, 2), (2, 5), (5, 2), (4, 6), (3, 8)])
def test_mixed_k_add_mul(ka, kb):
    """Mixed-limb-count operands promote to max(ka, kb) at full accuracy
    (regression: the k<=8 cascade dispatch indexed past the shorter
    operand's limb list)."""
    rng = np.random.default_rng(ka * 100 + kb)
    a_mp = rand_mp(rng, 64)
    b_mp = rand_mp(rng, 64)
    a = xf_from_mp(a_mp, k=ka)
    b = xf_from_mp(b_mp, k=kb)
    kmin = min(ka, kb)
    tol = ulp_bound(kmin) * 16
    s = xf_add(a, b)
    p = xf_mul(a, b)
    assert s.k == max(ka, kb) and p.k == max(ka, kb)
    for g, x, y in zip(xf_to_mp(s), a_mp, b_mp):
        o = x + y
        scale = max(abs(o), abs(x), abs(y), mpmath.mpf(2) ** -200)
        assert abs(g - o) <= scale * tol, (g, o)
    for g, x, y in zip(xf_to_mp(p), a_mp, b_mp):
        o = x * y
        scale = max(abs(o), mpmath.mpf(2) ** -200)
        assert abs(g - o) <= scale * tol, (g, o)


# ---------------------------------------------------------------------------
# Scaled expansions (exponent-extended limbs, ops/xfloat.py scaled_mode)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [4, 6, 10, 14])
@pytest.mark.parametrize("mag", ["1", "1e-10", "1e10"])
def test_scaled_f32_full_precision(k, mag):
    """Scaled f32 expansions must deliver the full ~24k-bit relative
    precision on every op at ANY value magnitude — the property plain
    f32 expansions lack (they plateau at ~127 bits for O(1) values
    because limb products underflow past 2^-149; measured round 4)."""
    from clrs_tpu.ops.xfloat import scaled_mode, xf_div, xf_sqrt

    mpmath.mp.prec = 60 * k + 300
    scale = mpmath.mpf(mag)
    with scaled_mode(24):
        a_mp = scale * mpmath.sqrt(2)
        b_mp = scale * (mpmath.pi / 3)
        a = xf_from_mp([a_mp], k=k, dtype=np.float32)
        b = xf_from_mp([b_mp], k=k, dtype=np.float32)
        a_r, b_r = xf_to_mp(a)[0], xf_to_mp(b)[0]
        # representation error
        assert abs(a_r / a_mp - 1) < mpmath.mpf(2) ** (-24 * k + 8)
        tol = mpmath.mpf(2) ** (-24 * k + 14)
        checks = [
            (xf_mul(a, b), a_r * b_r),
            (xf_add(a, b), a_r + b_r),
            (xf_div(a, b), a_r / b_r),
            (xf_sqrt(a), mpmath.sqrt(a_r)),
            # deep cancellation: (a+b) - a must recover b in full
            (xf_add(xf_add(a, b), XF(-a.limbs)), b_r),
        ]
        for got, want in checks:
            g = xf_to_mp(got)[0]
            assert abs(g / want - 1) < tol, (float(g), float(want), k, mag)


def test_scaled_f32_beats_plain_wall():
    """At k=10 f32, scaled mode must exceed the plain-expansion ~127-bit
    multiply wall by a wide margin (this is the point of the mode)."""
    from clrs_tpu.ops.xfloat import scaled_mode

    k = 10
    mpmath.mp.prec = 1000
    a_mp, b_mp = mpmath.sqrt(2), mpmath.pi / 3
    # plain f32: caps at ~2^-127 for O(1) values
    a = xf_from_mp([a_mp], k=k, dtype=np.float32)
    b = xf_from_mp([b_mp], k=k, dtype=np.float32)
    plain = abs(xf_to_mp(xf_mul(a, b))[0] / (a_mp * b_mp) - 1)
    with scaled_mode(24):
        a = xf_from_mp([a_mp], k=k, dtype=np.float32)
        b = xf_from_mp([b_mp], k=k, dtype=np.float32)
        sc = abs(xf_to_mp(xf_mul(a, b))[0] / (a_mp * b_mp) - 1)
    assert plain > mpmath.mpf(2) ** -150
    assert sc < mpmath.mpf(2) ** -220


def test_scaled_normal_times_tiny():
    """Normal x tiny products (the Newton-residual shape) keep full
    precision: operand normalization inside the scaled multiply."""
    from clrs_tpu.ops.xfloat import scaled_mode

    k = 14
    mpmath.mp.prec = 1200
    with scaled_mode(24):
        a_mp = mpmath.sqrt(2)
        t_mp = (mpmath.pi / 3) * mpmath.mpf(2) ** -100
        a = xf_from_mp([a_mp], k=k, dtype=np.float32)
        t = xf_from_mp([t_mp], k=k, dtype=np.float32)
        got = xf_to_mp(xf_mul(a, t))[0]
        want = xf_to_mp(a)[0] * xf_to_mp(t)[0]
        assert abs(got / want - 1) < mpmath.mpf(2) ** (-24 * k + 16)


def test_scaled_f64_limbs():
    """Scaled mode with f64 limbs (S=48) — used for CPU cross-checks of
    the TPU configuration."""
    from clrs_tpu.ops.xfloat import scaled_mode, xf_div

    k = 6
    mpmath.mp.prec = 800
    with scaled_mode(48):
        a_mp, b_mp = mpmath.sqrt(2), mpmath.pi / 3
        a = xf_from_mp([a_mp], k=k, dtype=np.float64)
        b = xf_from_mp([b_mp], k=k, dtype=np.float64)
        g = xf_to_mp(xf_div(a, b))[0]
        assert abs(g / (xf_to_mp(a)[0] / xf_to_mp(b)[0]) - 1) < mpmath.mpf(2) ** (-52 * k + 20)


def test_scaled_compare_where_sum():
    """Comparisons, selects and tree reductions under scaled mode."""
    from clrs_tpu.ops.xfloat import scaled_mode, xf_max, xf_sum, xf_where

    k = 6
    mpmath.mp.prec = 600
    rng = np.random.default_rng(7)
    with scaled_mode(24):
        vals = [mpmath.mpf(float(x)) * mpmath.mpf(2) ** int(e)
                for x, e in zip(rng.standard_normal(9),
                                rng.integers(-30, 30, 9))]
        v = xf_from_mp(vals, k=k, dtype=np.float32)
        s = xf_to_mp(xf_sum(v, axis=0).reshape((1,)))[0]
        want = sum(xf_to_mp(v))
        assert abs(s - want) <= abs(want) * mpmath.mpf(2) ** (-24 * k + 16)
        a, b = v[0:1], v[1:2]
        mx = xf_to_mp(xf_max(a, b))[0]
        assert mx == max(xf_to_mp(a)[0], xf_to_mp(b)[0])
        w = xf_where(np.array([True]), a, b)
        assert xf_to_mp(w)[0] == xf_to_mp(a)[0]
