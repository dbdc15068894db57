"""solvempmp — the full MPMP pipeline driver (reference MPMP.jl:562-586).

Maps prepareabc over all polynomial constraints, infers the block metadata,
and calls the clustered SDP solver.
"""

from __future__ import annotations

from typing import Optional, Sequence

from clrs_tpu.core.blockinfo import get_block_info
from clrs_tpu.core.solver import solverank1sdp
from clrs_tpu.models.prepare import prepareabc


def solvempmp(
    M: Sequence,
    G: Sequence,
    q: Sequence,
    x: Sequence,
    delta: Sequence,
    b,
    Pi: Optional[Sequence] = None,
    backend: str = "xla",
    **kwargs,
):
    """Solve a multivariate polynomial matrix program.

    Per constraint j: M[j] (list of matrix polys), G[j] (weights), q[j]
    (basis), x[j] (sample points), delta[j] (max degree), plus the objective
    vector b and optional symmetry matrices Pi[j].  Remaining kwargs are
    forwarded to the solver (MPMP.jl:571).

    backend="host" routes through the native high-precision host IPM
    (core/host_solver.py, precision_k up to ~12 f64 limbs) — the
    reference's 512-bit default regime; "xla" uses the device solver.
    """
    J = len(M)
    if Pi is not None:
        abc = [
            prepareabc(M[j], G[j], q[j], x[j], delta[j], Pi[j]) for j in range(J)
        ]
    else:
        abc = [prepareabc(M[j], G[j], q[j], x[j], delta[j]) for j in range(J)]
    blockinfo = get_block_info(abc)
    if backend == "host":
        from clrs_tpu.core.host_solver import solverank1sdp_host

        return solverank1sdp_host(abc, b, blockinfo, **kwargs)
    return solverank1sdp(abc, b, blockinfo, **kwargs)
