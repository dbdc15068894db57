"""Cluster-sharded step: multi-device correctness (SURVEY.md §4: shard the
same problem over 1 vs N devices and assert identical iterates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clrs_tpu.parallel.sharded import (
    HomogeneousShape,
    initial_sharded_state,
    make_cluster_mesh,
    make_sharded_step,
    random_homogeneous_problem,
)


@pytest.fixture(scope="module")
def problem():
    shape = HomogeneousShape(J=8, n_y=3, m=1, K=3, delta=3, rmax=1)
    data = random_homogeneous_problem(shape, seed=1, k=2)
    state = initial_sharded_state(shape, k=2)
    return shape, data, state


def run_steps(shape, data, state, n_devices, n_steps=3):
    mesh = make_cluster_mesh(n_devices)
    step = make_sharded_step(shape, mesh)
    diag = None
    for _ in range(n_steps):
        state, diag = step(data, state, jnp.bool_(False))
    return state, diag


def test_sharded_one_vs_many_devices(problem):
    """Gap-identical iterates between 1-device and 8-device runs."""
    shape, data, state = problem
    s1, d1 = run_steps(shape, data, state, 1)
    s8, d8 = run_steps(shape, data, state, min(8, len(jax.devices())))
    for a, b in zip(jax.tree_util.tree_leaves(s1), jax.tree_util.tree_leaves(s8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-25, atol=1e-28)
    assert bool(np.asarray(d1["ok"])) and bool(np.asarray(d8["ok"]))
    assert abs(float(np.asarray(d1["mu"])) - float(np.asarray(d8["mu"]))) < 1e-20


def test_sharded_matches_reference_solver(problem):
    """The sharded homogeneous step must agree with the general (unsharded)
    solver phases on the same problem for one iteration."""
    shape, data, state = problem
    s1, d1 = run_steps(shape, data, state, 1, n_steps=1)

    # build the same problem in the general solver's format
    from clrs_tpu.core.blockinfo import get_block_info
    from clrs_tpu.core.problem import pack_constraints
    import clrs_tpu.core.solver as S

    V = np.asarray(data["V"].limbs[0])  # (J, delta, K)
    B = np.asarray(data["B"].limbs[0])
    c = np.asarray(data["c"].limbs[0])[..., 0]
    b = np.asarray(data["b"].limbs[0])
    cons = []
    for j in range(shape.J):
        A = [[[V[j][:, kk].astype(object)] for kk in range(shape.K)]]
        H = [[[1.0] for _ in range(shape.K)]]
        cons.append((A, B[j].astype(object), c[j].astype(object), H))
    info = get_block_info(cons)
    # the sharded path consumes raw V/H data, so pack without the setup
    # reparameterizations (they change the iterates, not the problem)
    problem_g = pack_constraints(
        cons, b, info=info, equilibrate=False, orthonormalize=False,
        orthonormalize_B=False
    )
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False)
    phases = S.make_ipm_phases(problem_g, cfg)
    st = S.initial_state(problem_g, cfg)
    pd = jnp.bool_(False)
    pr = problem_g
    mu, R, X_inv, ok = phases["mu_R_Xinv"](pr, st, pd)
    decomp = phases["decomp"](pr, X_inv, st[3])
    P, p, d = phases["residuals"](pr, st[0], st[2], st[1], decomp["A_Y"])
    dxg, dXg, dyg, dYg = phases["direction"](pr, P, p, d, R, X_inv, st[3], decomp)
    beta_c, R2 = phases["corrector_R"](st[2], st[3], dXg, dYg, mu, pd)
    dxg, dXg, dyg, dYg = phases["direction"](pr, P, p, d, R2, X_inv, st[3], decomp)
    ap, _ = phases["steplength"](st[2], dXg)
    ad, _ = phases["steplength"](st[3], dYg)
    st2, diag = phases["update"](pr, st, dxg, dyg, dXg, dYg, ap, ad, pd, P, p, d, mu, beta_c)

    # compare y after one step
    y_sharded = np.asarray(s1[1].limbs[0]).ravel()
    y_general = np.asarray(st2[1].limbs[0]).ravel()
    np.testing.assert_allclose(y_sharded, y_general, rtol=1e-20, atol=1e-24)
    mu_s = float(np.asarray(d1["mu"]))
    mu_g = float(np.asarray(diag["mu"]))
    assert abs(mu_s - mu_g) < 1e-12 * max(1.0, abs(mu_g))
