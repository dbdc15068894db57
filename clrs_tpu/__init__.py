"""clrs_tpu — a TPU-native clustered low-rank SDP solver.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
Julia solver `nanleij/Clustered-Low-Rank-SDP-solver` (MPMP.jl): a primal-dual
XZ predictor-corrector interior-point method for clustered low-rank SDPs (the
SDPB problem class generalized to multivariate polynomial matrix programs),
in extended precision.

Layers (bottom-up):
  ops/       extended-precision (float-expansion) arithmetic + linear algebra
  core/      block metadata, state containers, the IPM solver
  models/    problem front-end: polynomial bases, sample points, prepareabc,
             the MPMP -> SDP compiler   (reference: MPMP.jl:22-200, 225-407)
  parallel/  device mesh / cluster sharding / collectives
  utils/     config, logging, checkpointing
  apps/      applications (sphere packing, Delsarte bounds) + SDPB export

Public API mirrors the reference's exported surface (MPMP.jl:19):
  solvempmp, solverank1sdp, get_block_info, prepareabc, laguerrebasis
"""

import os as _os

# XLA:CPU's fusion emitters apply value-changing codegen (fma contraction /
# reassociation) inside fused loops, which silently breaks the error-free
# transforms the extended-precision layer is built on.  Must be set before
# the XLA backend initializes.  (Found empirically: a double-double Cholesky
# loses its low limbs at fusion boundaries; disabling fusion emitters — or
# the fusion pass — restores exactness.)
if "--xla_cpu_use_fusion_emitters" not in _os.environ.get("XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "") + " --xla_cpu_use_fusion_emitters=false"
    ).strip()

# LLVM's expensive backend passes explode (>240s for a graph that compiles
# in 2s at level 1) on k>=3 extended-precision factorization loop bodies
# once tensor shapes cross the 2-vector width; level 1 costs a few percent
# of CPU kernel speed and removes the cliff.
if "--xla_backend_optimization_level" not in _os.environ.get("XLA_FLAGS", ""):
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=1"
    ).strip()

import jax as _jax

# Extended precision requires IEEE float64 limbs on CPU; on TPU the f32-limb
# backend is used by the kernels that need it. x64 must be enabled before any
# array is created.
_jax.config.update("jax_enable_x64", True)

# The axon TPU plugin force-registers itself and overrides JAX_PLATFORMS
# (CLAUDE.md); CLRS_FORCE_CPU=1 pins the CPU backend the supported way
# (what tests/conftest.py does) so scripts can run CPU-side while the one
# TPU chip is busy with a bench/compile.
if _os.environ.get("CLRS_FORCE_CPU", "") == "1":
    _jax.config.update("jax_platforms", "cpu")

# NOTE: the high-k trace paths need a recursion limit far above CPython's
# default; that raise is SCOPED (utils/limits.raised_recursion_limit,
# applied inside the solver drivers and Pallas dispatchers), not a global
# import-time side effect (ADVICE r4).

# The solver's jitted iteration graphs are large; cache compiled executables
# across processes (tests, benchmarks, repeated solves).
_cache_dir = _os.environ.get(
    "CLRS_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/clrs_tpu_xla")
)
try:  # pragma: no cover
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

from clrs_tpu.ops.xfloat import XF  # noqa: E402

# Layers above ops are imported lazily-tolerantly while the framework is
# built out bottom-up; all are present in the final API.
try:  # noqa: SIM105
    from clrs_tpu.core.blockinfo import BlockInfo, get_block_info  # noqa: E402
    from clrs_tpu.core.solver import solverank1sdp, SolverConfig  # noqa: E402
    from clrs_tpu.models.bases import (  # noqa: E402
        laguerrebasis,
        jacobi_basis,
        gegenbauer_basis,
        make_monomial_basis,
    )
    from clrs_tpu.models.prepare import prepareabc  # noqa: E402
    from clrs_tpu.models.mpmp import solvempmp  # noqa: E402
    from clrs_tpu.core.host_solver import solverank1sdp_host  # noqa: E402
    from clrs_tpu.core.escalate import solve_with_escalation  # noqa: E402
except ImportError:  # pragma: no cover - only during bootstrap
    pass

__version__ = "0.1.0"

__all__ = [
    "XF",
    "BlockInfo",
    "get_block_info",
    "solverank1sdp",
    "solverank1sdp_host",
    "solve_with_escalation",
    "SolverConfig",
    "solvempmp",
    "prepareabc",
    "laguerrebasis",
    "jacobi_basis",
    "gegenbauer_basis",
    "make_monomial_basis",
]
