"""Fused Pallas dd matmul (ops/pallas_xf.py) vs mpmath, interpret mode.

Value-based comparison (hi+lo sums): limb SPLITS may legitimately differ
from the XLA tree-sum path by an ulp of the hi limb while the represented
value is identical.

Tolerance note: interpret mode inlines the kernel into an XLA:CPU program
whose grid loop carries a TUPLE of buffers, and XLA:CPU at backend
optimization level >= 1 value-changes such loop bodies (lo limbs degrade
to ~1e-16 relative — the known issue documented in CLAUDE.md; barriers do
not protect, and the carry structure belongs to Pallas' interpreter, not
the kernel).  On real TPU hardware (Mosaic) the kernel is BIT-EXACT
against a sequential xf_mul/xf_add chain (verified on v5e, 2026-08-19,
batched and single).  Interpret-mode tests therefore use a ~2^-48
relative tolerance — loose enough for the inlining artifact, tight
enough to catch indexing/masking/padding bugs (which produce O(1)
errors).
"""

import mpmath
import numpy as np
import pytest

from clrs_tpu.ops.pallas_xf import xf_matmul_pallas
from clrs_tpu.ops.xfloat import xf_from_mp, xf_to_mp

mpmath.mp.prec = 220


def rand_dd_mp(rng, cnt, scale=8):
    return [
        mpmath.mpf(float(x)) * mpmath.mpf(2) ** int(e)
        + mpmath.mpf(float(y)) * mpmath.mpf(2) ** (int(e) - 40)
        for x, y, e in zip(
            rng.standard_normal(cnt),
            rng.standard_normal(cnt),
            rng.integers(-scale, scale + 1, cnt),
        )
    ]


@pytest.mark.parametrize(
    "batch,n,K,m",
    [((), 5, 7, 9), ((3,), 8, 8, 8), ((2, 2), 16, 13, 4), ((1,), 4, 33, 24)],
)
def test_matmul_pallas_interpret_vs_mpmath(batch, n, K, m):
    rng = np.random.default_rng(hash((batch, n, K, m)) % 2**32)
    sa = batch + (n, K)
    sb = batch + (K, m)
    a_mp = rand_dd_mp(rng, int(np.prod(sa)))
    b_mp = rand_dd_mp(rng, int(np.prod(sb)))
    a = xf_from_mp(a_mp, k=2).reshape(sa)
    b = xf_from_mp(b_mp, k=2).reshape(sb)
    # oracle on the dd-rounded inputs (no representation error term)
    Am = np.array(xf_to_mp(a.reshape((-1,))), dtype=object).reshape(sa)
    Bm = np.array(xf_to_mp(b.reshape((-1,))), dtype=object).reshape(sb)
    Ab = Am.reshape((-1, n, K))
    Bb = Bm.reshape((-1, K, m))
    C = np.stack([Ab[i] @ Bb[i] for i in range(Ab.shape[0])]).reshape(
        batch + (n, m)
    )
    got = xf_matmul_pallas(a, b, interpret=True)
    v = np.asarray(got.limbs, np.float64)
    val = v[0] + v[1]
    scale_max = float(np.max(np.abs(v[0]))) or 1.0
    tol = scale_max * 2.0**-48  # interpret-mode bound, see module docstring
    for idx in np.ndindex(val.shape):
        err = abs(float(val[idx] - float(C[idx])))
        assert err <= tol, (idx, err, tol)


def rand_xf_mp(rng, cnt, k, scale=8):
    """Random ~k*53-bit values with limb-spanning structure."""
    out = []
    comps = rng.standard_normal((cnt, k))
    exps = rng.integers(-scale, scale + 1, cnt)
    for i in range(cnt):
        v = mpmath.mpf(0)
        for j in range(k):
            v += mpmath.mpf(float(comps[i, j])) * mpmath.mpf(2) ** (
                int(exps[i]) - 50 * j
            )
        out.append(v)
    return out


@pytest.mark.parametrize(
    "k,batch,n,K,m",
    [
        # single-grid-step configs (no interpret-mode loop carry): these
        # verify the cascades at FULL (k-1)-limb value precision
        (3, (), 5, 7, 9),
        (4, (), 6, 4, 10),
        (6, (), 4, 4, 5),
        # multi-step / batched configs: the XLA:CPU grid-loop carry
        # degrades low limbs (module docstring), value-checked at ~2^-48
        (4, (2,), 8, 8, 8),
        (4, (), 6, 13, 10),
        (6, (), 4, 9, 5),
    ],
)
def test_matmul_pallas_k_interpret_vs_mpmath(k, batch, n, K, m):
    """The generic k-limb kernel (limb count as a static kernel parameter)
    against an mpmath oracle.  Interpret-mode tolerance: the last limbs
    degrade through the inlined grid loop when the kernel takes multiple
    grid steps (module docstring), so those configs are value-checked at
    the dd-test bound; single-step configs get the full k-limb bound."""
    mpmath.mp.prec = 60 * k + 200  # own precision (ambient is whatever ran last)
    rng = np.random.default_rng(hash((k, batch, n, K, m)) % 2**32)
    sa = batch + (n, K)
    sb = batch + (K, m)
    a_mp = rand_xf_mp(rng, int(np.prod(sa)), k)
    b_mp = rand_xf_mp(rng, int(np.prod(sb)), k)
    a = xf_from_mp(a_mp, k=k).reshape(sa)
    b = xf_from_mp(b_mp, k=k).reshape(sb)
    Am = np.array(xf_to_mp(a.reshape((-1,))), dtype=object).reshape(sa)
    Bm = np.array(xf_to_mp(b.reshape((-1,))), dtype=object).reshape(sb)
    Ab = Am.reshape((-1, n, K))
    Bb = Bm.reshape((-1, K, m))
    C = np.stack([Ab[i] @ Bb[i] for i in range(Ab.shape[0])]).reshape(
        batch + (n, m)
    )
    got = xf_matmul_pallas(a, b, interpret=True)
    gm = np.array(xf_to_mp(got.reshape((-1,))), dtype=object).reshape(
        batch + (n, m)
    )
    v0 = np.asarray(got.limbs, np.float64)[0]
    scale_max = float(np.max(np.abs(v0))) or 1.0
    # mirrors _pick_kc: one grid step iff K pads to <= 32 and no batch loop
    single_step = batch == () and ((K + 7) // 8) * 8 <= 32
    if single_step:
        # value-level bound: one limb of slack beyond the (k-1)-limb level
        tol = scale_max * 2.0 ** (-50 * (k - 1))
    else:
        tol = scale_max * 2.0**-48  # interpret loop-carry bound
    for idx in np.ndindex(C.shape):
        err = abs(float(gm[idx] - C[idx]))
        assert err <= tol, (idx, err, tol)


# ---------------------------------------------------------------------------
# k-limb fused SPD inverse
# ---------------------------------------------------------------------------


def make_spd_limbs_k(rng, B, n, k, cond=1e6, dtype=np.float64):
    """SPD blocks lifted to k limbs (exact in the leading limb)."""
    out = np.zeros((B, k, n, n), dtype)
    for b in range(B):
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = np.logspace(0, np.log10(cond), n)
        A = (Q * lam) @ Q.T
        out[b, 0] = ((A + A.T) / 2).astype(dtype)
    return out


@pytest.mark.parametrize("k,n", [(3, 5), (4, 8), (4, 1), (6, 7)])
def test_pallas_spd_inverse_k_reconstruction(k, n):
    """A @ inv(A) == I well beyond dd accuracy (the whole point of k>2).

    Interpret-mode loop carries degrade the LAST limbs (see module
    docstring), so the reconstruction check targets ~(k-1)-limb quality
    rather than the full k-limb floor."""
    import jax.numpy as jnp

    from clrs_tpu.ops.pallas_xf import xf_spd_inverse_pallas_k
    from clrs_tpu.ops.xfloat import XF, xf_matmul

    rng = np.random.default_rng(100 + 7 * k + n)
    B = 2
    limbs = make_spd_limbs_k(rng, B, n, k, cond=1e8)
    inv, ok = xf_spd_inverse_pallas_k(jnp.asarray(limbs), interpret=True)
    assert bool(jnp.all(ok)), (k, n)
    mpmath.mp.prec = 60 * k + 120
    for b in range(B):
        A = XF(jnp.asarray(limbs[b]))
        Inv = XF(jnp.asarray(inv[b]))
        R = xf_matmul(A, Inv)
        Rm = np.array(xf_to_mp(R.reshape((-1,))), dtype=object).reshape(n, n)
        err = np.max(np.abs((Rm - np.eye(n)).astype(np.float64)))
        # cond ~ 1e8 costs ~27 bits; (k-1) limbs ~ 2^-53(k-1)
        bound = 1e8 * 2.0 ** (-53 * (k - 1)) * 64
        assert err < bound, (k, n, b, err, bound)


def test_pallas_spd_inverse_k_flags_indefinite():
    import jax.numpy as jnp

    from clrs_tpu.ops.pallas_xf import xf_spd_inverse_pallas_k

    rng = np.random.default_rng(11)
    limbs = make_spd_limbs_k(rng, 2, 6, 4)
    limbs[1, 0] = -limbs[1, 0]
    _, ok = xf_spd_inverse_pallas_k(jnp.asarray(limbs), interpret=True)
    ok = np.asarray(ok)
    assert bool(ok[0]) and not bool(ok[1])


def test_pallas_spd_inverse_k_f32_limbs():
    """f32-limb (TPU numerics) k=4 variant: ~96-bit significand."""
    import jax.numpy as jnp

    from clrs_tpu.ops.pallas_xf import xf_spd_inverse_pallas_k
    from clrs_tpu.ops.xfloat import XF, xf_matmul

    rng = np.random.default_rng(12)
    n, k = 8, 4
    limbs = make_spd_limbs_k(rng, 2, n, k, cond=1e4, dtype=np.float32)
    inv, ok = xf_spd_inverse_pallas_k(jnp.asarray(limbs), interpret=True)
    assert bool(jnp.all(ok))
    mpmath.mp.prec = 200
    for b in range(2):
        A = XF(jnp.asarray(limbs[b]))
        Inv = XF(jnp.asarray(inv[b]))
        R = xf_matmul(A, Inv)
        Rm = np.array(xf_to_mp(R.reshape((-1,))), dtype=object).reshape(n, n)
        err = np.max(np.abs((Rm - np.eye(n)).astype(np.float64)))
        # 3 good f32 limbs ~ 2^-72; cond 1e4 ~ 2^13
        assert err < 1e4 * 2.0**-72 * 64, (b, err)


# ---------------------------------------------------------------------------
# k-limb fused step-length sandwich
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k,n", [(2, 6), (4, 9), (6, 5)])
def test_pallas_steplen_sandwich_k(k, n):
    """W = L^-1 dM L^-T value vs a numpy float64 oracle (the consumer is
    the Jacobi min-eig bound, which needs ~1e-6 relative accuracy)."""
    import jax.numpy as jnp

    from clrs_tpu.ops.pallas_xf import xf_steplen_sandwich_pallas_k

    rng = np.random.default_rng(50 + 10 * k + n)
    B = 3
    m_l = np.zeros((B, k, n, n))
    dm_l = np.zeros((B, k, n, n))
    for b in range(B):
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        m_l[b, 0] = (Q * np.logspace(0, 4, n)) @ Q.T
        D = rng.standard_normal((n, n))
        dm_l[b, 0] = (D + D.T) / 2
    W, ok = xf_steplen_sandwich_pallas_k(
        jnp.asarray(m_l), jnp.asarray(dm_l), interpret=True)
    assert bool(jnp.all(ok))
    for b in range(B):
        L = np.linalg.cholesky(m_l[b, 0])
        want = np.linalg.solve(L, np.linalg.solve(L, dm_l[b, 0]).T)
        got = np.asarray(W[b], np.float64)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 1e-10 * scale, (k, n, b)
        # eigenvalue-bound consumers: min eig agreement
        ev_w = np.linalg.eigvalsh((want + want.T) / 2).min()
        ev_g = np.linalg.eigvalsh((got + got.T) / 2).min()
        assert abs(ev_w - ev_g) < 1e-8 * max(1.0, abs(ev_w))


def test_pallas_steplen_sandwich_flags_not_spd():
    import jax.numpy as jnp

    from clrs_tpu.ops.pallas_xf import xf_steplen_sandwich_pallas_k

    rng = np.random.default_rng(3)
    n = 5
    m_l = np.zeros((2, 3, n, n))
    dm_l = np.zeros((2, 3, n, n))
    A = rng.standard_normal((n, n))
    m_l[0, 0] = A @ A.T + np.eye(n)
    m_l[1, 0] = -(A @ A.T) - np.eye(n)  # negative definite
    _, ok = xf_steplen_sandwich_pallas_k(
        jnp.asarray(m_l), jnp.asarray(dm_l), interpret=True)
    ok = np.asarray(ok)
    assert bool(ok[0]) and not bool(ok[1])


def test_solver_pallas_steplength_equivalent():
    """use_pallas_steplength reproduces the XLA step-length path's
    trajectory (same Jacobi-bound accuracy fed from the fused kernel)."""
    import sys

    sys.path.insert(0, ".")
    import numpy as np

    import __graft_entry__ as g
    import clrs_tpu.core.solver as S

    problem = g._tiny_delsarte_problem(d=2, k=2, dtype=np.float64)
    res = []
    for flag in (False, True):
        r = S.solverank1sdp(
            problem=problem, omega_p=100.0, omega_d=100.0,
            maxiterations=40, verbose=False, use_pallas_steplength=flag,
        )
        res.append(r)
    a, b = res
    assert a.iterations == b.iterations
    assert abs(a.dual_objective - b.dual_objective) < 1e-9 * max(
        1.0, abs(a.dual_objective))
    ga = [h["alpha_p"] for h in a.history]
    gb = [h["alpha_p"] for h in b.history]
    np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize(
    "k,m,K,rmax",
    [(2, 1, 5, 1), (3, 2, 3, 1), (4, 2, 3, 2), (6, 1, 4, 1)],
)
def test_schur_pairs_pallas_vs_xla_path(k, m, K, rmax):
    """The fused Schur elementwise kernel against the XLA cascade path on
    the same inputs.  Both compute the identical association
    ((p1+p2)+(p3+p4))*HH and the same segment-sum tree, so they agree to
    the interpret-mode value bound (single-program configs carry no
    inlined grid-loop state, but the output buffer still rides the
    interpret grid loop for P2 > 1)."""
    import jax.numpy as jnp

    from clrs_tpu.core.kernels import (
        _schur_block_contribution_pallas,
        schur_block_contribution,
    )
    from clrs_tpu.ops.xfloat import XF, xf_mul

    mpmath.mp.prec = 60 * k + 200
    rng = np.random.default_rng(hash((k, m, K, rmax)) % 2**32)
    T = K * rmax
    PX = xf_from_mp(rand_xf_mp(rng, m * T * m * T, k), k=k).reshape(
        (m, T, m, T))
    PY = xf_from_mp(rand_xf_mp(rng, m * T * m * T, k), k=k).reshape(
        (m, T, m, T))
    H = xf_from_mp(rand_xf_mp(rng, T, k, scale=2), k=k).reshape((T,))

    ref = schur_block_contribution(PX, PY, H, m, K, rmax)
    HH = xf_mul(XF(H.limbs[:, :, None]), XF(H.limbs[:, None, :]))
    HH = XF(HH.limbs * 0.25)
    got = _schur_block_contribution_pallas(
        PX, PY, HH, m, K, rmax, interpret=True)
    assert got.shape == ref.shape
    rv = np.asarray(ref.limbs, np.float64)
    gv = np.asarray(got.limbs, np.float64)
    ref_val = rv[0] + rv[1]
    got_val = gv[0] + gv[1]
    scale_max = float(np.max(np.abs(rv[0]))) or 1.0
    tol = scale_max * 2.0**-48
    assert np.max(np.abs(ref_val - got_val)) <= tol


@pytest.mark.parametrize("k,scaled", [(6, False), (6, True)])
def test_elemwise_pallas_matches_xla(k, scaled):
    """The generic elementwise add/mul kernel (xf_elemwise_pallas — the
    one-custom-call-per-op-site dispatch for high-k graphs) against the
    XLA cascade path on the same inputs."""
    import jax.numpy as jnp

    from clrs_tpu.ops.pallas_xf import xf_elemwise_pallas
    from clrs_tpu.ops.xfloat import XF, scaled_mode, xf_add, xf_mul

    rng = np.random.default_rng(k + scaled)
    dtype = np.float32 if scaled else np.float64
    step = 20 if scaled else 40
    shape = (5, 37)  # non-tile-aligned on purpose (exercises padding)
    al = [jnp.asarray(
        rng.standard_normal(shape) * 2.0 ** (-step * q), dtype)
        for q in range(k)]
    bl = [jnp.asarray(
        rng.standard_normal(shape) * 2.0 ** (-step * q), dtype)
        for q in range(k)]
    ctx = scaled_mode(24 if scaled else 0)
    with ctx:
        a = XF(jnp.stack(al))
        b = XF(jnp.stack(bl))
        ref_add = np.asarray(xf_add(a, b).limbs, np.float64)
        ref_mul = np.asarray(xf_mul(a, b).limbs, np.float64)
        got_add = np.asarray(
            xf_elemwise_pallas("add", al, bl, k, interpret=True).limbs,
            np.float64)
        got_mul = np.asarray(
            xf_elemwise_pallas("mul", al, bl, k, interpret=True).limbs,
            np.float64)
    # same cascades; interpret-mode barriers may differ from the XLA
    # path's fused graphs only in low-limb association -> value-compare
    # to well below the k-limb precision
    for ref, got in ((ref_add, got_add), (ref_mul, got_mul)):
        rv = ref.sum(axis=0)
        gv = got.sum(axis=0)
        scale = np.max(np.abs(rv)) or 1.0
        tol = scale * 2.0 ** (-step * (k - 1))
        assert np.max(np.abs(rv - gv)) <= tol


@pytest.mark.parametrize("k", [6, 7])
def test_matmul_loop_kc_matches_unrolled(k):
    """The fori_loop kc accumulation (the high-k scoped-VMEM bound,
    _LOOP_KC_MIN_K) is bit-identical to the Python-unrolled body: same
    association, and the one-hot B-row selection is exact."""
    import functools as ft

    import jax
    import jax.numpy as jnp

    from clrs_tpu.ops import pallas_xf as px

    rng = np.random.default_rng(k)
    n, K, m = 5, 11, 4
    al = np.stack([
        rng.standard_normal((1, n, K)) * 2.0 ** (-30 * q) for q in range(k)
    ]).astype(np.float64)
    bl = np.stack([
        rng.standard_normal((1, K, m)) * 2.0 ** (-30 * q) for q in range(k)
    ]).astype(np.float64)

    outs = {}
    for loop in (False, True):
        orig = px._matmul_kernel_k
        try:
            px_kern = ft.partial(orig)
            # drive the batched entry with the loop flag forced
            def forced(a5_ref, b_ref, out_ref, acc, *, k, kc, barrier,
                       scale_bits=0, loop_kc=None, _loop=loop):
                return orig(a5_ref, b_ref, out_ref, acc, k=k, kc=kc,
                            barrier=barrier, scale_bits=scale_bits,
                            loop_kc=_loop)

            px._matmul_kernel_k = forced
            px._matmul_batched_k.clear_cache()
            outs[loop] = np.asarray(px._matmul_batched_k(
                jnp.asarray(al), jnp.asarray(bl), interpret=True))
        finally:
            px._matmul_kernel_k = orig
            px._matmul_batched_k.clear_cache()
    np.testing.assert_array_equal(outs[True], outs[False])


@pytest.mark.parametrize("k,tb,T", [(2, 8, 20), (3, 16, 16)])
def test_schur_pairs_tiled_matches_untiled(k, tb, T):
    """The row-tiled Schur-pairs dispatch (large-T VMEM fallback) is the
    SAME kernel body on row bands: bit-identical to the untiled batched
    call, including the zero-padded non-divisible-T case."""
    from clrs_tpu.ops.pallas_xf import (
        _schur_pairs_batched,
        _schur_pairs_batched_tiled,
    )

    rng = np.random.default_rng(hash((k, tb, T)) % 2**32)
    B = 2
    a = rng.standard_normal((k, B, 4, T, T)) * (2.0 ** (-40 * np.arange(
        k, dtype=np.float64)))[:, None, None, None, None]
    b = rng.standard_normal((k, B, 4, T, T)) * (2.0 ** (-40 * np.arange(
        k, dtype=np.float64)))[:, None, None, None, None]
    hh = rng.standard_normal((k, T, T)) * (2.0 ** (-40 * np.arange(
        k, dtype=np.float64)))[:, None, None]
    ref = np.asarray(_schur_pairs_batched(a, b, hh, interpret=True))
    got = np.asarray(
        _schur_pairs_batched_tiled(a, b, hh, interpret=True, tb=tb))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("k,batch,n,K,m", [(4, (), 4, 5, 3), (6, (), 3, 4, 3)])
def test_matmul_pallas_scaled_vs_mpmath(k, batch, n, K, m):
    """The k-limb kernel in SCALED mode (f32, S=24) against mpmath: full
    ~24k-bit relative precision, which plain f32 cannot reach for k>~6
    (exponent floor)."""
    from clrs_tpu.ops.xfloat import scaled_mode

    mpmath.mp.prec = 60 * k + 300
    rng = np.random.default_rng(hash((k, n, K, m)) % 2**32)
    with scaled_mode(24):
        sa = batch + (n, K)
        sb = batch + (K, m)
        a = xf_from_mp(
            rand_xf_mp(rng, int(np.prod(sa)), k, scale=12), k=k,
            dtype=np.float32).reshape(sa)
        b = xf_from_mp(
            rand_xf_mp(rng, int(np.prod(sb)), k, scale=12), k=k,
            dtype=np.float32).reshape(sb)
        Am = np.array(xf_to_mp(a.reshape((-1,))), dtype=object).reshape(sa)
        Bm = np.array(xf_to_mp(b.reshape((-1,))), dtype=object).reshape(sb)
        C = Am.reshape((-1, n, K)) @ Bm.reshape((-1, K, m))
        C = C.reshape(batch + (n, m))
        got = xf_matmul_pallas(a, b, interpret=True)
        G = np.array(xf_to_mp(got.reshape((-1,))), dtype=object).reshape(
            batch + (n, m))
        tol = mpmath.mpf(2) ** (-24 * k + 18)
        for idx in np.ndindex(C.shape):
            denom = abs(C[idx]) + mpmath.mpf(2) ** -400
            assert abs((G[idx] - C[idx]) / denom) < tol, (idx,)


def test_schur_pairs_pallas_scaled_vs_xla():
    """Scaled-mode Schur kernel against the scaled XLA cascade path."""
    from clrs_tpu.core.kernels import (
        _schur_block_contribution_pallas,
        schur_block_contribution,
    )
    from clrs_tpu.ops.xfloat import XF, scaled_mode, xf_mul

    k, m, K, rmax = 4, 2, 3, 1
    mpmath.mp.prec = 60 * k + 200
    rng = np.random.default_rng(11)
    with scaled_mode(24):
        T = K * rmax
        PX = xf_from_mp(rand_xf_mp(rng, m * T * m * T, k), k=k,
                        dtype=np.float32).reshape((m, T, m, T))
        PY = xf_from_mp(rand_xf_mp(rng, m * T * m * T, k), k=k,
                        dtype=np.float32).reshape((m, T, m, T))
        H = xf_from_mp(rand_xf_mp(rng, T, k, scale=2), k=k,
                       dtype=np.float32).reshape((T,))
        ref = schur_block_contribution(PX, PY, H, m, K, rmax)
        HH = xf_mul(XF(H.limbs[:, :, None]), XF(H.limbs[:, None, :]))
        HH = XF(HH.limbs * 0.25)
        got = _schur_block_contribution_pallas(
            PX, PY, HH, m, K, rmax, interpret=True)
        rv = np.array(xf_to_mp(ref.reshape((-1,))), dtype=object)
        gv = np.array(xf_to_mp(got.reshape((-1,))), dtype=object)
        scale_max = max(abs(v) for v in rv) + mpmath.mpf(2) ** -200
        for r, g in zip(rv, gv):
            assert abs(r - g) <= scale_max * mpmath.mpf(2) ** -48


def test_spd_inverse_pallas_scaled():
    """Scaled-mode fused SPD inverse (interpret): reconstruction to the
    expansion precision on an ill-conditioned block."""
    from clrs_tpu.ops.xfloat import XF, scaled_mode

    from clrs_tpu.ops.pallas_xf import xf_spd_inverse_pallas_k

    k, n = 4, 4
    mpmath.mp.prec = 60 * k + 300
    rng = np.random.default_rng(5)
    with scaled_mode(24):
        M = rng.standard_normal((n, n))
        Mm = [[sum(mpmath.mpf(float(M[i, t])) * mpmath.mpf(float(M[j, t]))
                   * mpmath.mpf(10) ** -(3 * t) for t in range(n))
               + (mpmath.mpf("1e-8") if i == j else 0) for j in range(n)]
              for i in range(n)]
        Mx = xf_from_mp(np.array(Mm, dtype=object), k=k, dtype=np.float32)
        inv, ok = xf_spd_inverse_pallas_k(
            np.asarray(Mx.limbs)[None], interpret=True)
        assert bool(np.asarray(ok)[0])
        invx = XF(np.asarray(inv)[0])
        Im = np.array(xf_to_mp(invx.reshape((-1,))), dtype=object).reshape(
            n, n)
        resid = max(
            abs(sum(Mm[i][t] * Im[t, j] for t in range(n))
                - (1 if i == j else 0))
            for i in range(n) for j in range(n)
        )
        # cond ~1e11 eats ~37 bits of the 96-bit budget
        assert resid < mpmath.mpf(2) ** -40, float(resid)


@pytest.mark.parametrize("k,n,K,m,bn,bm", [(2, 12, 9, 10, 8, 8),
                                           (4, 10, 7, 12, 8, 8)])
def test_matmul_pallas_tiled_interpret(k, n, K, m, bn, bm):
    """The tiled kernel (output (bn, bm) tiles, contraction streamed)
    against the mpmath oracle — shapes deliberately NOT tile multiples
    to exercise the exact zero-padding."""
    from clrs_tpu.ops.pallas_xf import xf_matmul_pallas_tiled

    mpmath.mp.prec = 60 * k + 200
    rng = np.random.default_rng(hash((k, n, K, m)) % 2**32)
    a = xf_from_mp(rand_xf_mp(rng, n * K, k), k=k).reshape((n, K))
    b = xf_from_mp(rand_xf_mp(rng, K * m, k), k=k).reshape((K, m))
    Am = np.array(xf_to_mp(a.reshape((-1,))), dtype=object).reshape(n, K)
    Bm = np.array(xf_to_mp(b.reshape((-1,))), dtype=object).reshape(K, m)
    C = Am @ Bm
    got = xf_matmul_pallas_tiled(a, b, interpret=True, bn=bn, bm=bm)
    v = np.asarray(got.limbs, np.float64)
    val = v[0] + v[1]
    scale_max = float(np.max(np.abs(v[0]))) or 1.0
    tol = scale_max * 2.0**-48  # interpret-mode bound (module docstring)
    for idx in np.ndindex(val.shape):
        assert abs(float(val[idx] - float(C[idx]))) <= tol, (idx,)
