"""Pallas dd SPD-inverse kernel (interpret mode on CPU) vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clrs_tpu.ops.pallas_dd import dd_spd_inverse_pallas
from clrs_tpu.ops.linalg import xf_spd_inverse, xf_sym
from clrs_tpu.ops.xfloat import XF


def make_spd_batch(rng, B, n, cond=1e6, dtype=np.float64):
    out = np.zeros((B, 2, n, n), dtype)
    for b in range(B):
        Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = np.logspace(0, np.log10(cond), n)
        A = (Q * lam) @ Q.T
        A = (A + A.T) / 2
        out[b, 0] = A.astype(dtype)
    return out


@pytest.mark.parametrize("n", [1, 3, 8, 17])
def test_pallas_spd_inverse_matches_xla(n):
    rng = np.random.default_rng(0)
    B = 3
    limbs = make_spd_batch(rng, B, n)
    inv_p, ok = dd_spd_inverse_pallas(jnp.asarray(limbs), interpret=True)
    assert bool(jnp.all(ok))
    for b in range(B):
        x = XF(jnp.asarray(limbs[b]))
        inv_x, okx = xf_spd_inverse(x)
        assert bool(okx)
        got = np.asarray(inv_p[b, 0], np.float64) + np.asarray(inv_p[b, 1], np.float64)
        want = np.asarray(inv_x.to_float64())
        scale = np.max(np.abs(want))
        assert np.max(np.abs(got - want)) < 1e-25 * scale, (n, b)


def test_pallas_spd_inverse_reconstruction_dd_accuracy():
    """A @ inv(A) == I to double-double accuracy (beyond plain f64)."""
    from clrs_tpu.ops.xfloat import xf_matmul

    rng = np.random.default_rng(1)
    n = 12
    limbs = make_spd_batch(rng, 1, n, cond=1e8)
    inv_p, ok = dd_spd_inverse_pallas(jnp.asarray(limbs), interpret=True)
    assert bool(ok[0])
    A = XF(jnp.asarray(limbs[0]))
    Inv = XF(jnp.asarray(inv_p[0]))
    R = xf_matmul(A, Inv)
    err = np.abs(np.asarray(R.to_float64()) - np.eye(n))
    assert err.max() < 1e-22


def test_pallas_spd_inverse_flags_indefinite():
    rng = np.random.default_rng(2)
    n = 5
    limbs = make_spd_batch(rng, 2, n)
    limbs[1, 0] = -limbs[1, 0]  # negative definite
    inv_p, ok = dd_spd_inverse_pallas(jnp.asarray(limbs), interpret=True)
    ok = np.asarray(ok)
    assert bool(ok[0]) and not bool(ok[1])


def test_pallas_spd_inverse_f32_limbs():
    """f32-limb (TPU numerics) variant reaches dd-f32 accuracy (~1e-14)."""
    rng = np.random.default_rng(3)
    n = 9
    limbs = make_spd_batch(rng, 2, n, cond=1e4, dtype=np.float32)
    inv_p, ok = dd_spd_inverse_pallas(jnp.asarray(limbs), interpret=True)
    assert bool(jnp.all(ok))
    for b in range(2):
        A64 = np.asarray(limbs[b, 0], np.float64)
        want = np.linalg.inv(A64)
        got = np.asarray(inv_p[b, 0], np.float64) + np.asarray(inv_p[b, 1], np.float64)
        scale = np.max(np.abs(want))
        assert np.max(np.abs(got - want)) < 1e-11 * scale


@pytest.mark.parametrize("n", [1, 3, 8, 17])
def test_pallas_wide_spd_inverse_matches_xla(n):
    """Batch-on-lanes variant (one grid step for the whole batch)."""
    from clrs_tpu.ops.pallas_dd import dd_spd_inverse_pallas_wide

    rng = np.random.default_rng(0)
    B = 5
    limbs = make_spd_batch(rng, B, n)
    inv_p, ok = dd_spd_inverse_pallas_wide(jnp.asarray(limbs), interpret=True)
    assert bool(jnp.all(ok))
    for b in range(B):
        x = XF(jnp.asarray(limbs[b]))
        inv_x, okx = xf_spd_inverse(x)
        assert bool(okx)
        got = np.asarray(inv_p[b, 0], np.float64) + np.asarray(inv_p[b, 1], np.float64)
        want = np.asarray(inv_x.to_float64())
        scale = np.max(np.abs(want))
        assert np.max(np.abs(got - want)) < 1e-25 * scale, (n, b)


def test_pallas_wide_chunking_and_padding():
    """Chunked grid (max_chunk_elems forces 2 chunks + identity padding)
    agrees with the single-chunk result; flags survive per block."""
    from clrs_tpu.ops.pallas_dd import dd_spd_inverse_pallas_wide

    rng = np.random.default_rng(4)
    n, B = 6, 5
    limbs = make_spd_batch(rng, B, n)
    limbs[3, 0] = -limbs[3, 0]  # negative definite slot
    inv1, ok1 = dd_spd_inverse_pallas_wide(jnp.asarray(limbs), interpret=True)
    inv2, ok2 = dd_spd_inverse_pallas_wide(
        jnp.asarray(limbs), interpret=True, max_chunk_elems=3 * n * n)
    ok1, ok2 = np.asarray(ok1), np.asarray(ok2)
    assert list(ok1) == [True, True, True, False, True]
    assert list(ok1) == list(ok2)
    np.testing.assert_array_equal(np.asarray(inv1), np.asarray(inv2))


def test_solver_with_pallas_inverse_matches_default():
    """End-to-end IPM with use_pallas_inverse=True (interpret mode on CPU):
    the fused Pallas SPD-inverse (SolverConfig.use_pallas_inverse) reproduces
    the default XLA fori_loop factorization path to double-double accuracy."""
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
    res_pl = solverank1sdp(cons, [1.0], get_block_info(cons),
                           use_pallas_inverse=True, **kwargs)
    assert res_ref.converged and res_pl.converged, (res_ref.status, res_pl.status)
    assert abs(res_ref.primal_objective - res_pl.primal_objective) < 1e-12
