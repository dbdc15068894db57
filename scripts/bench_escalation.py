"""Hybrid-ladder end-to-end benchmark (VERDICT r2 item 4).

Times the intended deployment story — cheap device-dd iterations first,
native-host high-k endgame — via solve_with_escalation on the two
sphere-packing configs, against the pure-host rungs:

  sp16 (2d=16): pure host k=10 ~30 s (BASELINE.md round-2 headline)
  sp30 (2d=30): pure host k=10 ~122-150 s

Reports per-rung iteration counts and wall clock.  The reference's
analogue is "restart at higher precision with initial_solutions"
(MPMP.jl:793, 1881-1884, 613-614).

Usage: python scripts/bench_escalation.py [sp16|sp30] [ladder...]
  e.g. python scripts/bench_escalation.py sp16 2 host6 host10
Device rungs are ints (XLA path), host rungs are 'hostK' strings.
Default: the library defaults (device ladder + host (6, 10)).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import mpmath


def main():
    if os.environ.get("CLRS_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    which = sys.argv[1] if len(sys.argv) > 1 else "sp16"
    spec = sys.argv[2:]
    k_ladder = None
    host_ladder = (6, 10)
    if spec:
        k_ladder = [int(s) for s in spec if not s.startswith("host")]
        host_ladder = tuple(
            int(s[4:]) for s in spec if s.startswith("host")) or (10,)

    from clrs_tpu.apps.sphere_packing import nsphere_packing_2point
    from clrs_tpu.core.escalate import solve_with_escalation

    d = 8 if which == "sp16" else 15
    prec = 53 * 10 + 150
    mpmath.mp.prec = prec
    r = [mpmath.mpf(1), mpmath.sqrt(mpmath.mpf(2)) - 1]
    constraints, b, blockinfo = nsphere_packing_2point(
        3, d, r, 2, prec=prec, build_only=True)
    t0 = time.time()
    res = solve_with_escalation(
        constraints, b, blockinfo,
        k_ladder=k_ladder, host_ladder=host_ladder,
        omega_p=100.0, omega_d=100.0,
        maxiterations=350, verbose=True,
        duality_gap_threshold=1e-15,
        primal_error_threshold=1e-30,
        dual_error_threshold=1e-30,
        stall_patience=40,
    )
    wall = time.time() - t0
    row = res.history[-1] if res.history else {}
    print(f"\n[escalation {which}] status={res.status} "
          f"converged={res.converged} bound={-res.dual_objective!r} "
          f"gap={row.get('gap', float('nan')):.2e} "
          f"iters_final_rung={res.iterations} wall={wall:.1f}s")
    rungs = getattr(res, "rungs", None)
    if rungs:
        for r_ in rungs:
            print(f"  rung {r_}")


if __name__ == "__main__":
    main()
