"""Known-answer integration test: Delsarte LP kissing-number bound.

In dimension 8 the LP bound at polynomial degree >= 6 is exactly 240
(Odlyzko-Sloane); this drives the full pipeline end-to-end
(bases -> samples -> prepareabc -> pack -> IPM).  Run at a reduced
convergence budget to keep CI time bounded; the bound is already correct
to ~1e-6 at gap ~1e-8.
"""

import pytest

from clrs_tpu.apps.delsarte import delsarte_lp_bound


@pytest.mark.slow
def test_delsarte_dim8_kissing_240():
    bound, res = delsarte_lp_bound(
        8,
        3,
        prec=256,
        verbose=False,
        maxiterations=70,
        duality_gap_threshold=1e-9,
        primal_error_threshold=1e-20,
        dual_error_threshold=1e-20,
    )
    assert res.converged, res.status
    assert abs(bound - 240.0) < 1e-5, bound
