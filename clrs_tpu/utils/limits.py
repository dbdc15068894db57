"""Scoped interpreter-limit helpers.

Tracing the high-k kernels (k ~ 14 scaled-f32 = the reference's 512-bit
regime) nests JAX trace frames past CPython's default 1000-frame limit
(measured: the k=14 Pallas SPD-inverse trace RecursionErrors at the
default, traces fine raised).  Raising sys.setrecursionlimit globally at
import is a side effect for every embedder, and because JAX tracing
interleaves C++ dispatch frames a runaway recursion at a 100k limit can
exhaust the C stack and segfault instead of raising RecursionError — so
the raise is scoped to the trace paths that need it and restored after
(ADVICE r4).
"""

import contextlib
import sys

HIGH_K_TRACE_LIMIT = 100_000


@contextlib.contextmanager
def raised_recursion_limit(limit: int = HIGH_K_TRACE_LIMIT):
    """Raise the recursion limit within the block, restoring it after.

    No-op (and re-entrant) when the ambient limit is already >= `limit`.
    """
    old = sys.getrecursionlimit()
    if old >= limit:
        yield
        return
    sys.setrecursionlimit(limit)
    try:
        yield
    finally:
        # only restore if nothing inside raised it further
        if sys.getrecursionlimit() == limit:
            sys.setrecursionlimit(old)
