"""Multi-host bring-up: jax.distributed + global device meshes.

The reference is single-process shared-memory only (`julia -t N`,
README.md:12); its scaling limit is one machine.  The TPU build scales
across hosts with `jax.distributed`: every process initializes against a
coordinator, sees the GLOBAL device list, and runs the same SPMD program
(parallel/hetero.py's bundle-sharded step) over a mesh spanning all
chips of all hosts.  Communication per iteration is exactly the five
small reductions of SURVEY.md §5.8 (Q/p/dy partial sums, step-length
min, scalar dots) — O(n_y^2) + scalars — riding ICI within a host and
DCN across hosts, which is why the iteration rate scales.

Single-process runs (tests, the virtual CPU mesh) skip initialization
and behave identically on the local device list.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from clrs_tpu.core.blockinfo import BlockInfo, distribute_weights_swapping

_initialized = False


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed (idempotent).  Arguments default to the
    standard env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID) or, on TPU pods, to the platform's auto-detection.
    Returns the process index.  No-op for single-process runs."""
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    want_multi = coordinator_address is not None or (
        num_processes is not None and num_processes > 1
    )
    if want_multi and not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return jax.process_index()


def global_cluster_mesh() -> Mesh:
    """1-D mesh over ALL devices of ALL processes, axis "cluster" — the
    mesh the hetero-sharded step expects.  Devices are ordered
    process-major so each host's shard of every bundle lives on its own
    chips (collectives cross DCN only at the reduction points)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), ("cluster",))


def host_chip_mesh() -> Mesh:
    """2-D ("host", "chip") mesh — for programs that want separate axes
    (e.g. cluster bundles over hosts, intra-cluster T-sharding over the
    chips of each host)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_host = jax.process_count()
    per_host = len(devs) // n_host
    grid = np.array(devs).reshape(n_host, per_host)
    return Mesh(grid, ("host", "chip"))


def assign_clusters_to_hosts(
    info: BlockInfo, n_hosts: int
) -> Sequence[Sequence[int]]:
    """Weighted static assignment of clusters to hosts, weights =
    sum_l blocksize^3 (the reference's load-balancing cost proxy,
    MPMP.jl:425-465, 495).  Used when clusters are solved host-locally
    (one bundle per host) instead of bundle-sharded over the global
    mesh; also the setup-time placement hint for data loading."""
    weights = [
        float(sum(info.block_weight(j, l) for l in range(info.L[j])))
        for j in range(info.J)
    ]
    sets, _ = distribute_weights_swapping(weights, n_hosts)
    return sets


def solve_hetero_multihost(problem, maxiterations: int = 200, cfg=None,
                           verbose: bool = False):
    """Initialize multihost (if configured), run the bundle-sharded
    solver over the global cluster mesh."""
    from clrs_tpu.parallel.hetero import solve_hetero_sharded

    init_multihost()
    mesh = global_cluster_mesh()
    return solve_hetero_sharded(
        problem, mesh, maxiterations=maxiterations, cfg=cfg, verbose=verbose
    )
