"""SDPB-format export/import round trips (SURVEY.md §4 cross-validation
hook; the reference only exports, via the external WriteFilesSDPB package)."""

import mpmath
import numpy as np
import pytest

from clrs_tpu.apps.sdpb_export import write_sdpb_files
from clrs_tpu.apps.sdpb_import import read_sdpb_dir, solve_sdpb
from clrs_tpu.core.blockinfo import get_block_info
from clrs_tpu.core.solver import solverank1sdp


def make_lp_constraint(vs, B, c):
    K = len(vs)
    A = [[[np.asarray(v, dtype=object).reshape(-1)] for v in vs]]
    H = [[[mpmath.mpf(1)] for _ in range(K)]]
    return (A, np.asarray(B, dtype=object), np.asarray(c, dtype=object), H)


@pytest.fixture
def tiny_problem():
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    cons = [make_lp_constraint(vs, [[1.0], [2.0]], [1.0, 1.0])]
    return cons, [1.0], get_block_info(cons)


def test_native_roundtrip(tiny_problem, tmp_path):
    cons, b, info = tiny_problem
    write_sdpb_files(str(tmp_path / "sdp"), cons, info, b, b0=0.5)
    cons2, b2, info2, b0 = read_sdpb_dir(str(tmp_path / "sdp"))
    assert info2.J == info.J and info2.n_y == info.n_y
    assert info2.dim_S == info.dim_S
    assert float(b0) == 0.5
    assert [float(v) for v in b2] == [1.0]
    # numerical identity of the round-tripped data
    assert float(cons2[0][2][0]) == 1.0
    np.testing.assert_allclose(
        np.array(cons2[0][0][0][0][0], dtype=float), [1.0, 0.0]
    )
    # solving the round-tripped problem matches (objective 1/2 + b0 shift)
    res = solverank1sdp(cons2, b2, info2, b0=b0, omega_p=100.0, omega_d=100.0,
                        maxiterations=200, verbose=False)
    assert res.converged
    assert abs(res.primal_objective - 1.0) < 1e-9  # 0.5 + b0 0.5


def test_sdpb2_roundtrip(tiny_problem, tmp_path):
    cons, b, info = tiny_problem
    write_sdpb_files(str(tmp_path / "sdp2"), cons, info, b, format="sdpb2")
    # layout check: SDPB 2.x files exist
    assert (tmp_path / "sdp2" / "control.json").exists()
    assert (tmp_path / "sdp2" / "block_info_0.json").exists()
    assert (tmp_path / "sdp2" / "block_data_0.json").exists()
    cons2, b2, info2, b0 = read_sdpb_dir(str(tmp_path / "sdp2"))
    assert info2.J == info.J and info2.n_y == info.n_y
    res = solve_sdpb(str(tmp_path / "sdp2"), omega_p=100.0, omega_d=100.0,
                     maxiterations=200, verbose=False)
    assert res.converged
    assert abs(res.primal_objective - 0.5) < 1e-9


def test_sdpb2_rejects_general_rank(tmp_path):
    """General-rank data cannot be expressed in SDPB 2.x layout."""
    vs = [np.array([1.0, 0.0]), np.array([0.0, 1.0])]
    A = [[[vs[0], vs[1]], [vs[1]]]]  # rank 2 at sample 0
    H = [[[mpmath.mpf(1), mpmath.mpf(2)], [mpmath.mpf(1)]]]
    B = np.asarray([[1.0], [1.0]], dtype=object)
    c = np.asarray([1.0, 1.0], dtype=object)
    cons = [(A, B, c, H)]
    info = get_block_info(cons)
    with pytest.raises(ValueError):
        write_sdpb_files(str(tmp_path / "bad"), cons, info, [1.0], format="sdpb2")


def test_zip_archive(tiny_problem, tmp_path):
    import os
    import zipfile

    cons, b, info = tiny_problem
    d = tmp_path / "sdp"
    write_sdpb_files(str(d), cons, info, b)
    zpath = str(tmp_path / "sdp.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for name in os.listdir(d):
            z.write(os.path.join(d, name), name)
    cons2, b2, info2, b0 = read_sdpb_dir(zpath)
    assert info2.J == info.J
