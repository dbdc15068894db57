"""Host-path cluster-thread scaling (VERDICT r2 item 5).

Builds a J=16 multi-cluster PMP — 16 equal-weight copies of the Delsarte
dim-8 2d=10 main constraint sharing the objective variables (the
many-comparable-cluster shape the reference threads over,
MPMP.jl:1435/1454/1751) — packs it at k=10 f64 limbs (~530 bits, the
512-bit regime), and times fixed-iteration solve_host runs at
host_threads = 1, 2, ... nproc.

Usage: python scripts/bench_host_threads.py [J] [k] [iters]
Never imports jax (pure host path).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import mpmath
import numpy as np


def build_cons(J: int, two_d: int = 10):
    from clrs_tpu.models.bases import gegenbauer_basis
    from clrs_tpu.models.poly import MPoly, poly_matrix
    from clrs_tpu.models.prepare import prepareabc
    from clrs_tpu.models.samples import create_sample_points_chebyshev

    mpmath.mp.prec = 900
    d = two_d // 2
    n = 8
    deg = 2 * d
    x = MPoly.var(0, 1)
    gb = gegenbauer_basis(deg, n, x)
    M_main = [poly_matrix([[MPoly.constant(-1, 1)]])] + [
        poly_matrix([[-gb[kk]]]) for kk in range(1, deg + 1)
    ]
    ct = mpmath.mpf("0.5")
    G_main = [MPoly.constant(1, 1), (x + 1) * (MPoly.constant(ct, 1) - x)]
    q_main = gegenbauer_basis(d, n, x)
    pts = create_sample_points_chebyshev(deg, -1, ct)
    con = prepareabc(M_main, G_main, q_main, pts, deg)
    b = [-1.0] * deg
    return [con] * J, b


def main():
    from clrs_tpu.core.blockinfo import get_block_info
    from clrs_tpu.core.host_solver import solverank1sdp_host

    J = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cons, b = build_cons(J)
    info = get_block_info(cons)
    print(f"J={info.J} dim_S={info.dim_S[0]} x{info.J}  k={k}  "
          f"iters={iters}")
    rows = []
    for threads in sorted({1, 2, os.cpu_count() or 1}):
        t0 = time.time()
        res = solverank1sdp_host(
            cons, b, info, precision_k=k, host_threads=threads,
            omega_p=100.0, omega_d=100.0, maxiterations=iters,
            verbose=False,
        )
        wall = time.time() - t0
        # exclude setup: time per measured iteration from history rows
        it_wall = res.history[-1]["time"] - res.history[0]["time"]
        per_it = it_wall / max(1, len(res.history) - 1)
        decomp = res.timings.get("decomp", 0.0)
        rows.append((threads, per_it, decomp, wall))
        print(f"threads={threads}: {per_it*1e3:8.1f} ms/iter  "
              f"decomp_total={decomp:6.2f}s  wall={wall:6.1f}s  "
              f"({1.0/per_it:.2f} it/s)")
    if len(rows) > 1:
        base = rows[0][1]
        for threads, per_it, _, _ in rows[1:]:
            print(f"speedup x{base/per_it:.2f} at {threads} threads")


if __name__ == "__main__":
    main()
