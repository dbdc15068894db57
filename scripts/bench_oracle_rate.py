"""Measure the mpmath-oracle IPM iteration rate on BASELINE config 1.

The reference publishes no numbers and Julia/SDPB are not in this
container, so the only runnable reference-CLASS implementation is the
repo's own independent dense mpmath oracle (clrs_tpu/utils/oracle.py):
the same XZ predictor-corrector algorithm (MPMP.jl:595-1025) in
arbitrary-precision host arithmetic with no low-rank exploitation, no
preconditioning, and no compiled kernels — structurally the same
category of implementation as the reference's BigFloat path.  Its
measured it/s at 512-bit working precision on BASELINE config 1 replaces
the previously INVENTED 2.0 it/s denominator in bench.py (VERDICT r3
weak #7 / item 7).

Usage: python scripts/bench_oracle_rate.py [iters] [prec_bits]
Prints one line: measured seconds/iteration and it/s.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import mpmath  # noqa: E402

from bench import build_problem  # noqa: E402
from clrs_tpu.utils.oracle import solve_oracle  # noqa: E402


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    prec = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    d = int(os.environ.get("CLRS_BENCH_D", "5"))
    cons, b, info = build_problem(d, None, return_cons=True)
    mpmath.mp.prec = prec
    # warm one iteration separately (python/mpmath caches, allocator)
    t0 = time.time()
    solve_oracle(cons, b, info, maxiterations=1, verbose=False)
    warm = time.time() - t0
    t0 = time.time()
    res = solve_oracle(cons, b, info, maxiterations=iters, verbose=False)
    dt = time.time() - t0
    print(
        f"oracle config-1 (Delsarte dim-8 2d={2*d}) at {prec}-bit mpmath: "
        f"{dt / iters:.2f} s/iter = {iters / dt:.4f} it/s "
        f"({iters} iters, warm-iter {warm:.2f}s, status {res['status']})"
    )


if __name__ == "__main__":
    main()
