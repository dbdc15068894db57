"""Subprocess-isolated solves for per-limb-count XLA flag selection.

XLA flags (notably --xla_backend_optimization_level) are read once at
backend initialization, so a process cannot switch them per solve.  But
the right level depends on the limb count k: at level >=1 LLVM's
expensive backend passes blow up on k>=4 factorization loop bodies
(hour-scale compiles of a single IPM phase — observed on the sphere
packing 2d=16 problem), while level 0 compiles the same phase in
seconds and costs only VPU-kernel speed.  The escalation driver
(core/escalate.py) therefore runs high-k rungs in a fresh subprocess
with the appropriate flags; this module is both the parent-side helper
and the child entry point (python -m clrs_tpu.core.subproc in.pkl
out.pkl).

The wire format is a pickle of exact host-side data (mpmath constraint
tuples, numpy-limb warm-start state), so no precision is lost crossing
the boundary and the child repacks the problem at its own k.
"""

from __future__ import annotations

import os
import pickle
import subprocess
import sys
import tempfile
from typing import Optional

SLOW_COMPILE_K = 4  # k at which level>=1 backend compiles cliff


def xla_flags_for_k(k: int) -> str:
    """The XLA flag set a solve at k limbs wants (see module docstring;
    the fusion-emitter flag is the EFT-safety requirement from
    clrs_tpu/__init__.py)."""
    level = 0 if k >= SLOW_COMPILE_K else 1
    return (
        f"--xla_backend_optimization_level={level} "
        "--xla_cpu_use_fusion_emitters=false"
    )


def current_opt_level() -> Optional[int]:
    flags = os.environ.get("XLA_FLAGS", "")
    for tok in flags.split():
        if tok.startswith("--xla_backend_optimization_level="):
            try:
                return int(tok.split("=", 1)[1])
            except ValueError:
                return None
    return None


def needs_isolation(k: int) -> bool:
    """True when a solve at k limbs wants a different backend opt level
    than this process was initialized with.  The opt-level cliff is an
    XLA:CPU (LLVM backend) phenomenon; on the TPU backend high-k phases
    compile through Mosaic custom-calls and never want isolation."""
    import jax

    if jax.default_backend() == "tpu":
        return False
    want = 0 if k >= SLOW_COMPILE_K else 1
    have = current_opt_level()
    if have is None:
        have = 1  # clrs_tpu/__init__.py default
    return want != have


def _tree_numpy(x):
    import jax
    import numpy as np

    return jax.tree.map(lambda a: np.asarray(a), x)


def solve_in_subprocess(
    constraints,
    b,
    blockinfo,
    k: int,
    initial_solutions=(),
    C=None,
    b0=0,
    platform: Optional[str] = None,
    **solver_kwargs,
):
    """Run solverank1sdp in a child process with flags for k limbs.
    Returns the child's SolveResult (numpy-limbed)."""
    payload = dict(
        constraints=constraints,
        b=b,
        blockinfo=blockinfo,
        k=k,
        initial_solutions=_tree_numpy(tuple(initial_solutions)),
        C=C,
        b0=b0,
        kwargs=solver_kwargs,
    )
    with tempfile.TemporaryDirectory(prefix="clrs_subproc_") as td:
        fin = os.path.join(td, "in.pkl")
        fout = os.path.join(td, "out.pkl")
        with open(fin, "wb") as f:
            pickle.dump(payload, f)
        env = dict(os.environ)
        env["XLA_FLAGS"] = xla_flags_for_k(k)
        if platform is not None:
            env["CLRS_SUBPROC_PLATFORM"] = platform
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        proc = subprocess.run(
            [sys.executable, "-m", "clrs_tpu.core.subproc", fin, fout],
            env=env,
        )
        if proc.returncode != 0 or not os.path.exists(fout):
            raise RuntimeError(
                f"subprocess solve (k={k}) failed with code {proc.returncode}"
            )
        with open(fout, "rb") as f:
            return pickle.load(f)


def _child_main(fin: str, fout: str) -> None:
    # XLA_FLAGS are already in the environment (set by the parent);
    # importing clrs_tpu keeps them (it only appends missing flags).
    import jax

    platform = os.environ.get("CLRS_SUBPROC_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    from clrs_tpu.core.solver import solverank1sdp  # noqa: E402 (after flags)

    with open(fin, "rb") as f:
        payload = pickle.load(f)
    res = solverank1sdp(
        payload["constraints"],
        payload["b"],
        payload["blockinfo"],
        C=payload["C"],
        b0=payload["b0"],
        precision_k=payload["k"],
        initial_solutions=payload["initial_solutions"],
        **payload["kwargs"],
    )
    for name in ("x", "X", "y", "Y", "P", "p", "d"):
        setattr(res, name, _tree_numpy(getattr(res, name)))
    with open(fout, "wb") as f:
        pickle.dump(res, f)


if __name__ == "__main__":
    _child_main(sys.argv[1], sys.argv[2])
