"""XF linear algebra vs mpmath oracles (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import mpmath
import numpy as np
import pytest

from clrs_tpu.ops.linalg import (
    xf_cholesky,
    xf_inverse_lu,
    xf_lu,
    xf_lu_solve,
    xf_min_eig_sym,
    xf_solve_tril,
    xf_solve_triu,
    xf_spd_inverse,
    xf_sym,
)
from clrs_tpu.ops.xfloat import XF, xf_from_mp, xf_matmul, xf_to_mp

mpmath.mp.prec = 350


def rand_spd_mp(rng, n, cond_pow=8):
    """SPD matrix with condition ~10^cond_pow as mpmath object array."""
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.logspace(0, -cond_pow, n)
    a = (q * d) @ q.T
    m = np.empty((n, n), dtype=object)
    for i in range(n):
        for j in range(n):
            m[i, j] = mpmath.mpf(float(a[i, j]))
    # exact symmetrization
    return (m + m.T) / 2


def mp_err(got, want):
    scale = max(abs(v) for v in np.asarray(want).ravel()) + mpmath.mpf(1e-300)
    return max(abs(g - w) for g, w in zip(np.asarray(got).ravel(), np.asarray(want).ravel())) / scale


def test_cholesky_identity_roundtrip():
    rng = np.random.default_rng(0)
    n = 12
    a_mp = rand_spd_mp(rng, n, cond_pow=6)
    a = xf_from_mp(a_mp, k=2)
    L, ok = xf_cholesky(a)
    assert bool(ok)
    rec = xf_matmul(L, L.T)
    err = mp_err(xf_to_mp(rec), a_mp)
    assert err < 1e-28, err
    # strictly lower triangular structure
    Lnp = np.asarray(L.limbs[0])
    assert np.allclose(np.triu(Lnp, 1), 0)


def test_cholesky_fails_on_indefinite():
    a = XF.from_float(np.diag([1.0, -1.0, 2.0]), k=2)
    _, ok = xf_cholesky(a)
    assert not bool(ok)


def test_solve_triangular():
    rng = np.random.default_rng(1)
    n, m = 10, 3
    a_mp = rand_spd_mp(rng, n, cond_pow=4)
    a = xf_from_mp(a_mp, k=2)
    L, ok = xf_cholesky(a)
    b_mp = np.array([mpmath.mpf(float(x)) for x in rng.standard_normal(n * m)]).reshape(n, m)
    b = xf_from_mp(b_mp, k=2)
    x = xf_solve_tril(L, b)
    rec = xf_matmul(L, x)
    assert mp_err(xf_to_mp(rec), b_mp) < 1e-28
    xu = xf_solve_triu(L.T, b)
    rec = xf_matmul(L.T, xu)
    assert mp_err(xf_to_mp(rec), b_mp) < 1e-28


def test_lu_and_solve():
    rng = np.random.default_rng(2)
    n = 14
    a_np = rng.standard_normal((n, n))
    a_mp = np.empty((n, n), dtype=object)
    for i in range(n):
        for j in range(n):
            a_mp[i, j] = mpmath.mpf(float(a_np[i, j]))
    a = xf_from_mp(a_mp, k=2)
    lu, perm, ok = xf_lu(a)
    assert bool(ok)
    b_mp = np.array([mpmath.mpf(float(x)) for x in rng.standard_normal(n)]).reshape(n, 1)
    b = xf_from_mp(b_mp, k=2)
    x = xf_lu_solve(lu, perm, b)
    rec = xf_matmul(a, x)
    assert mp_err(xf_to_mp(rec), b_mp) < 1e-27


def test_lu_needs_pivoting():
    """Zero in the leading entry forces a row swap."""
    a_np = np.array([[0.0, 2.0], [3.0, 1.0]])
    a = XF.from_float(a_np, k=2)
    lu, perm, ok = xf_lu(a)
    assert bool(ok)
    b = XF.from_float(np.array([[4.0], [5.0]]), k=2)
    x = xf_lu_solve(lu, perm, b)
    want = np.linalg.solve(a_np, np.array([[4.0], [5.0]]))
    assert np.allclose(np.asarray(x.limbs[0]), want)


def test_spd_inverse_high_condition():
    """cond ~1e10 SPD inverse must still give ~1e-20 residual in dd."""
    rng = np.random.default_rng(3)
    n = 10
    a_mp = rand_spd_mp(rng, n, cond_pow=10)
    a = xf_from_mp(a_mp, k=2)
    inv, ok = xf_spd_inverse(a)
    assert bool(ok)
    rec = xf_matmul(a, inv)
    eye = np.empty((n, n), dtype=object)
    for i in range(n):
        for j in range(n):
            eye[i, j] = mpmath.mpf(1 if i == j else 0)
    # residual limited by cond * eps_dd ~ 1e10 * 1e-32
    assert mp_err(xf_to_mp(rec), eye) < 1e-18


def test_inverse_lu_matches_spd():
    rng = np.random.default_rng(4)
    n = 8
    a_mp = rand_spd_mp(rng, n, cond_pow=5)
    a = xf_from_mp(a_mp, k=2)
    i1, ok1 = xf_spd_inverse(a)
    i2, ok2 = xf_inverse_lu(a)
    assert bool(ok1) and bool(ok2)
    assert mp_err(xf_to_mp(i1), xf_to_mp(i2)) < 1e-25


def test_min_eig_sym():
    rng = np.random.default_rng(5)
    n = 9
    m_mp = rand_spd_mp(rng, n, cond_pow=3)
    dm_np = rng.standard_normal((n, n))
    dm_np = (dm_np + dm_np.T) / 2
    m = xf_from_mp(m_mp, k=2)
    dm = XF.from_float(dm_np, k=2)
    lam, ok = xf_min_eig_sym(m, dm)
    assert bool(ok)
    # oracle in numpy f64
    m_np = np.vectorize(float)(m_mp).astype(np.float64)
    L = np.linalg.cholesky(m_np)
    w = np.linalg.solve(L, dm_np)
    lml = np.linalg.solve(L, w.T)
    want = np.min(np.linalg.eigvalsh((lml + lml.T) / 2))
    assert abs(float(lam) - want) < 1e-9 * max(1, abs(want))


def test_jit_and_vmap_cholesky():
    rng = np.random.default_rng(6)
    n, batch = 6, 4
    mats = []
    for _ in range(batch):
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        d = np.logspace(0, -3, n)
        mats.append((q * d) @ q.T)
    a = XF.from_float(np.stack(mats), k=2)  # (batch, n, n)
    # XF leaves carry limbs in axis 0, so the batch axis is 1
    chol_b = jax.jit(jax.vmap(xf_cholesky, in_axes=1, out_axes=(1, 0)))
    L, ok = chol_b(a)
    assert L.shape == (batch, n, n)
    assert bool(np.all(np.asarray(ok)))
    for i in range(batch):
        rec = np.asarray(L.limbs[0][i]) @ np.asarray(L.limbs[0][i]).T
        assert np.allclose(rec, mats[i], atol=1e-12)


def test_jacobi_min_eig_lower_bound_and_tight():
    """Parallel-order Jacobi min-eig (the TPU step-length eigensolver):
    never exceeds the true lambda_min, and is tight after 6 sweeps."""
    from clrs_tpu.ops.linalg import jacobi_min_eig

    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 5, 8, 16, 33):
        A = rng.standard_normal((n, n))
        A = (A + A.T) / 2
        lam_true = np.linalg.eigvalsh(A)[0]
        for dtype in (np.float64, np.float32):
            lam = float(jax.jit(jacobi_min_eig)(jnp.asarray(A, dtype=dtype)))
            tol = 1e-10 if dtype == np.float64 else 1e-4
            scale = max(1.0, abs(lam_true))
            assert lam <= lam_true + tol * scale, (n, dtype, lam, lam_true)
            assert lam >= lam_true - 1e-3 * scale, (n, dtype, lam, lam_true)


def test_jacobi_min_eig_vmapped_batch():
    from clrs_tpu.ops.linalg import jacobi_min_eig

    rng = np.random.default_rng(3)
    A = rng.standard_normal((5, 9, 9))
    A = (A + np.swapaxes(A, 1, 2)) / 2
    lam = jax.vmap(jacobi_min_eig)(jnp.asarray(A))
    ref = np.linalg.eigvalsh(A)[:, 0]
    np.testing.assert_allclose(np.asarray(lam), ref, rtol=1e-8, atol=1e-9)


def test_xf_min_eig_sym_f32_limbs_uses_jacobi():
    """f32-limb (TPU-numerics) path: min-eig through Cholesky + Jacobi."""
    rng = np.random.default_rng(11)
    n = 6
    L = np.tril(rng.standard_normal((n, n)))
    np.fill_diagonal(L, np.abs(np.diagonal(L)) + 1.0)
    M = (L @ L.T).astype(np.float32)
    dM = rng.standard_normal((n, n)).astype(np.float32)
    dM = (dM + dM.T) / 2
    mx = XF.from_float(jnp.asarray(M), k=2)
    dmx = XF.from_float(jnp.asarray(dM), k=2)
    lam, ok = jax.jit(xf_min_eig_sym)(mx, dmx)
    assert bool(ok)
    Lnp = np.linalg.cholesky(M.astype(np.float64))
    ref = np.linalg.eigvalsh(
        np.linalg.solve(Lnp, np.linalg.solve(Lnp, dM.astype(np.float64).T).T)
    )[0]
    assert float(lam) <= ref + 1e-4 * max(1.0, abs(ref))
    assert float(lam) >= ref - 1e-3 * max(1.0, abs(ref))


def test_panel_trisolves_match_sequential(monkeypatch):
    """Blocked panel forward/back substitution (the large-block dispatch
    of xf_solve_tril/triu) matches the sequential loops at the dd ulp,
    including the (n,) RHS form and unit_diag."""
    import clrs_tpu.ops.linalg as LA

    rng = np.random.default_rng(7)
    n, m = 40, 5
    L = np.tril(rng.standard_normal((n, n))) + 4 * np.eye(n)
    B = rng.standard_normal((n, m))
    Lx = XF.from_float(jnp.asarray(L))
    Bx = XF.from_float(jnp.asarray(B))
    for unit in (False, True):
        xs = LA.xf_solve_tril_seq(Lx, Bx, unit_diag=unit)
        xp = LA.xf_solve_tril_panel(Lx, Bx, unit_diag=unit, panel=16)
        a, b = np.asarray(xs.limbs), np.asarray(xp.limbs)
        scale = np.max(np.abs(a[0])) or 1.0
        assert np.max(np.abs((a[0] + a[1]) - (b[0] + b[1]))) < 1e-27 * scale
    U = np.triu(rng.standard_normal((n, n))) + 4 * np.eye(n)
    Ux = XF.from_float(jnp.asarray(U))
    xs = LA.xf_solve_triu_seq(Ux, Bx)
    xp = LA.xf_solve_triu_panel(Ux, Bx, panel=16)
    a, b = np.asarray(xs.limbs), np.asarray(xp.limbs)
    scale = np.max(np.abs(a[0])) or 1.0
    assert np.max(np.abs((a[0] + a[1]) - (b[0] + b[1]))) < 1e-27 * scale
    # (n,) RHS keeps its shape through the panel path (the sequential
    # kernel only takes (n, m))
    v = XF.from_float(jnp.asarray(rng.standard_normal(n)))
    x1 = XF(LA.xf_solve_tril_seq(Lx, XF(v.limbs[:, :, None])).limbs[:, :, 0])
    x2 = LA.xf_solve_tril_panel(Lx, v, panel=16)
    assert x2.shape == (n,)
    a, b = np.asarray(x1.limbs), np.asarray(x2.limbs)
    scale = np.max(np.abs(a[0])) or 1.0
    assert np.max(np.abs((a[0] + a[1]) - (b[0] + b[1]))) < 1e-27 * scale


def test_spd_inverse_panel_dispatch(monkeypatch):
    """xf_spd_inverse through the lowered panel threshold reconstructs
    the identity as well as the sequential path (the full blocked
    chol+trisolve pipeline the solver's huge-block regime now uses)."""
    import clrs_tpu.ops.linalg as LA

    rng = np.random.default_rng(11)
    n = 48
    a = rand_spd_mp(rng, n, cond_pow=6)
    ax = xf_from_mp(a, k=2, dtype=np.float64)
    monkeypatch.setattr(LA, "_PANEL_MIN_N", 32)
    monkeypatch.setattr(LA, "_PANEL_DEFAULT", 16)
    inv_p, okp = LA.xf_spd_inverse(ax)
    monkeypatch.setattr(LA, "_PANEL_MIN_N", 10**9)
    inv_s, oks = LA.xf_spd_inverse(ax)
    assert bool(okp) and bool(oks)
    rp = mp_err(xf_to_mp(xf_matmul(ax, inv_p).reshape((-1,))),
                np.eye(n).ravel())
    rs = mp_err(xf_to_mp(xf_matmul(ax, inv_s).reshape((-1,))),
                np.eye(n).ravel())
    assert rp < 1e-22 and rs < 1e-22, (float(rp), float(rs))
