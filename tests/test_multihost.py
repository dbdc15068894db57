"""Multi-host bring-up (parallel/multihost.py): single-process behavior
of the init/mesh/assignment helpers, and the global-mesh solve path.
(Real >=2-process runs need a coordinator; here process_count == 1 and
the global mesh is the local virtual 8-device mesh.)"""

import jax
import numpy as np

import clrs_tpu  # noqa: F401
from clrs_tpu.parallel.multihost import (
    assign_clusters_to_hosts,
    global_cluster_mesh,
    host_chip_mesh,
    init_multihost,
    solve_hetero_multihost,
)


def test_init_single_process_noop():
    assert init_multihost() == jax.process_index() == 0


def test_meshes():
    m1 = global_cluster_mesh()
    assert m1.axis_names == ("cluster",)
    assert m1.devices.size == len(jax.devices())
    m2 = host_chip_mesh()
    assert m2.axis_names == ("host", "chip")
    assert m2.devices.shape == (1, len(jax.devices()))


def test_cluster_host_assignment_balances():
    import bench

    problem, info = bench.build_problem(d=3, dtype=np.float64, k=2)
    sets = assign_clusters_to_hosts(info, 2)
    assert sorted(j for s in sets for j in s) == list(range(info.J))
    w = [
        sum(sum(info.block_weight(j, l) for l in range(info.L[j])) for j in s)
        for s in sets
    ]
    # the one big polynomial cluster dominates; the balancer must put all
    # sign clusters on the other host
    assert min(len(s) for s in sets) == 1


def test_solve_hetero_multihost_runs():
    import bench
    import clrs_tpu.core.solver as S

    problem, info = bench.build_problem(d=3, dtype=np.float64, k=2)
    cfg = S.SolverConfig(omega_p=100.0, omega_d=100.0, verbose=False,
                         duality_gap_threshold=1e-12)
    res = solve_hetero_multihost(problem, maxiterations=150, cfg=cfg)
    assert res.dual_gap < 1e-9, res.status
