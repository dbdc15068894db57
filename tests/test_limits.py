"""utils/limits: the scoped recursion-limit raise (ADVICE r4)."""

import sys

from clrs_tpu.utils.limits import HIGH_K_TRACE_LIMIT, raised_recursion_limit


def test_raise_and_restore():
    old = sys.getrecursionlimit()
    assert old < HIGH_K_TRACE_LIMIT
    with raised_recursion_limit():
        assert sys.getrecursionlimit() == HIGH_K_TRACE_LIMIT
        # re-entrant: inner scope is a no-op, exit must not clobber
        with raised_recursion_limit():
            assert sys.getrecursionlimit() == HIGH_K_TRACE_LIMIT
        assert sys.getrecursionlimit() == HIGH_K_TRACE_LIMIT
    assert sys.getrecursionlimit() == old


def test_no_lowering_on_exit():
    old = sys.getrecursionlimit()
    with raised_recursion_limit(limit=max(old - 100, 100)):
        # ambient already higher than requested: nothing changes
        assert sys.getrecursionlimit() == old
    assert sys.getrecursionlimit() == old


def test_inner_raise_wins():
    old = sys.getrecursionlimit()
    with raised_recursion_limit(limit=old + 1000):
        sys.setrecursionlimit(old + 5000)  # someone raised it further
    # the scope must not stomp the higher limit back down
    assert sys.getrecursionlimit() == old + 5000
    sys.setrecursionlimit(old)
