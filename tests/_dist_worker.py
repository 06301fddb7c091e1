"""Worker for the 2-process jax.distributed smoke test (run by
tests/test_parallel.py::test_two_process_distributed_solve).

Each process owns 2 virtual CPU devices; the coordinator stitches them into
one 4-device global mesh spanning a real process boundary — the closest
single-machine analogue of BASELINE config 5's multi-host (DCN) setup.  The
worker then runs the edge-sharded GN-CG pose-graph solve over the global
mesh and checks its cost against the process-local dense LM solve.

Usage: python tests/_dist_worker.py <pid> <nproc> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nislam_tpu.core.pose_graph import (  # noqa: E402
    PoseGraphProblem,
    solve_pose_graph,
)
from nislam_tpu.core.se2 import absolute_pose, relative_pose  # noqa: E402
from nislam_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402
from nislam_tpu.parallel.solver import CGSolverConfig, solve_pose_graph_cg  # noqa: E402


def chain_problem(rng, k=24, cap=32, ecap=64):
    """Deterministic noisy odometry chain + one loop edge (same on every
    process — the map state is replicated, only the solve is sharded)."""
    gt = np.zeros((k, 3))
    for i in range(1, k):
        step = np.array([0.5, 0.1 * rng.standard_normal(), 0.1 * rng.standard_normal()])
        gt[i] = np.asarray(absolute_pose(jnp.asarray(gt[i - 1]), jnp.asarray(step)))
    fr, to, ts = [], [], []
    for i in range(1, k):
        rel = np.array(relative_pose(jnp.asarray(gt[i - 1]), jnp.asarray(gt[i])))
        rel[:2] += 0.02 * rng.standard_normal(2)
        fr.append(i - 1)
        to.append(i)
        ts.append(rel)
    fr.append(0)
    to.append(k - 1)
    ts.append(np.array(relative_pose(jnp.asarray(gt[0]), jnp.asarray(gt[k - 1]))))
    e = len(ts)
    init = np.zeros((cap, 3), np.float32)
    for i in range(1, k):
        init[i] = np.asarray(absolute_pose(jnp.asarray(init[i - 1]), jnp.asarray(ts[i - 1])))
    T = np.zeros((ecap, 3), np.float32)
    T[:e] = ts
    f_ = np.zeros(ecap, np.int32)
    t_ = np.zeros(ecap, np.int32)
    f_[:e] = fr
    t_[:e] = to
    return PoseGraphProblem(
        poses=jnp.asarray(init),
        pose_mask=jnp.arange(cap) < k,
        from_slot=jnp.asarray(f_),
        to_slot=jnp.asarray(t_),
        T=jnp.asarray(T),
        sqrt_info=jnp.broadcast_to(jnp.eye(3), (ecap, 3, 3)),
        edge_mask=jnp.arange(ecap) < e,
    )


def main() -> int:
    ndev = init_distributed(f"localhost:{port}", nproc, pid)
    assert ndev == 2 * nproc, f"global devices {ndev} != {2 * nproc}"
    assert jax.process_count() == nproc

    mesh = make_mesh({"bank": ndev})

    from jax.sharding import NamedSharding, PartitionSpec as P

    def gshard(x, spec):
        """Host-replicated numpy → global jax.Array with the given spec."""
        x = np.asarray(x)
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    rng = np.random.default_rng(0)
    prob = chain_problem(rng)
    gprob = PoseGraphProblem(
        poses=gshard(prob.poses, P()),
        pose_mask=gshard(prob.pose_mask, P()),
        from_slot=gshard(prob.from_slot, P("bank")),
        to_slot=gshard(prob.to_slot, P("bank")),
        T=gshard(prob.T, P("bank")),
        sqrt_info=gshard(prob.sqrt_info, P("bank")),
        edge_mask=gshard(prob.edge_mask, P("bank")),
    )
    cg_poses, cg_cost = solve_pose_graph_cg(
        gprob, mesh, cfg=CGSolverConfig(outer_iterations=30, cg_iterations=100)
    )
    # Replicated outputs: every process reads the scalar + its local shard.
    cg_cost = float(np.asarray(jax.device_get(cg_cost.addressable_data(0))))

    dense_poses, _, dense_cost = solve_pose_graph(prob)  # process-local
    dense_cost = float(dense_cost)
    assert cg_cost <= dense_cost * 1.05 + 1e-6, (cg_cost, dense_cost)

    local_poses = np.asarray(jax.device_get(cg_poses.addressable_data(0)))
    np.testing.assert_allclose(
        local_poses[:24], np.asarray(dense_poses[:24]), atol=2e-3
    )
    print(f"DIST_OK pid={pid} cost={cg_cost:.6f} dense={dense_cost:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
