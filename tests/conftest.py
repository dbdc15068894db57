"""Test config: run on a virtual 8-device CPU mesh with IEEE float64.

The fake multi-device backend mirrors the reference's single-process thread
model (reference README.md:12 `julia -t N`): tests of the sharded paths
assert gap-identical iterates between 1 and N devices (SURVEY.md §4).
"""

import os

# NOTE: the axon TPU plugin (sitecustomize) force-registers itself and
# overrides JAX_PLATFORMS from the environment, so the config update below —
# which runs after plugin registration — is the authoritative switch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# see clrs_tpu/__init__.py: CPU fusion emitters break error-free transforms;
# LLVM expensive passes explode on k>=3 factorization bodies
if "--xla_cpu_use_fusion_emitters" not in flags:
    flags = (flags + " --xla_cpu_use_fusion_emitters=false").strip()
if "--xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
