"""Pose-graph optimizer tests (SURVEY §4a oracle + convergence gates).

The residual is checked against a NumPy oracle of the Ceres error term
(/root/reference/include/optimization_2d/pose_graph_2d_error_term.h:62-116);
the solver is checked by recovering ground truth from noisy odometry +
exact loop constraints.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nislam_tpu.core.pose_graph import (
    PoseGraphProblem,
    SolverConfig,
    residuals,
    solve_pose_graph,
    sqrt_information,
)
from nislam_tpu.core.se2 import absolute_pose, relative_pose


def _np_normalize(a):
    return (a + math.pi) % (2 * math.pi) - math.pi


def _np_residual(pa, pb, t, sqrt_info):
    """Ceres PoseGraph2dErrorTerm oracle."""
    c, s = math.cos(pa[2]), math.sin(pa[2])
    rat = np.array([[c, s], [-s, c]])
    r = np.empty(3)
    r[:2] = rat @ (pb[:2] - pa[:2]) - t[:2]
    r[2] = _np_normalize(pb[2] - pa[2] - t[2])
    return sqrt_info @ r


def _chain_problem(rng, k=12, cap=16, ecap=32, noise=0.0, loop=False):
    """Random smooth trajectory; odometry edges (+ optional exact loop edge)."""
    gt = np.zeros((k, 3))
    for i in range(1, k):
        step = np.array([0.5, 0.1 * rng.standard_normal(), 0.2 * rng.standard_normal()])
        gt[i] = np.asarray(absolute_pose(jnp.asarray(gt[i - 1]), jnp.asarray(step)))

    from_slot, to_slot, ts = [], [], []
    for i in range(1, k):
        rel = np.array(relative_pose(jnp.asarray(gt[i - 1]), jnp.asarray(gt[i])))
        rel[:2] += noise * rng.standard_normal(2)
        rel[2] += noise * rng.standard_normal()
        from_slot.append(i - 1)
        to_slot.append(i)
        ts.append(rel)
    if loop:
        rel = np.asarray(relative_pose(jnp.asarray(gt[0]), jnp.asarray(gt[k - 1])))
        from_slot.append(0)
        to_slot.append(k - 1)
        ts.append(rel)

    e = len(ts)
    # Initial guess: integrate the noisy odometry (what the tracker produces).
    init = np.zeros((cap, 3), np.float32)
    for i in range(1, k):
        init[i] = np.asarray(
            absolute_pose(jnp.asarray(init[i - 1]), jnp.asarray(ts[i - 1]))
        )

    T = np.zeros((ecap, 3), np.float32)
    T[:e] = np.asarray(ts)
    fr = np.zeros(ecap, np.int32)
    to = np.zeros(ecap, np.int32)
    fr[:e] = from_slot
    to[:e] = to_slot
    prob = PoseGraphProblem(
        poses=jnp.asarray(init),
        pose_mask=jnp.arange(cap) < k,
        from_slot=jnp.asarray(fr),
        to_slot=jnp.asarray(to),
        T=jnp.asarray(T),
        sqrt_info=jnp.broadcast_to(jnp.eye(3), (ecap, 3, 3)),
        edge_mask=jnp.arange(ecap) < e,
    )
    return prob, gt, k


def test_residual_matches_ceres_oracle(rng):
    k, e = 5, 7
    poses = rng.standard_normal((k, 3)).astype(np.float32)
    fr = rng.integers(0, k, e).astype(np.int32)
    to = rng.integers(0, k, e).astype(np.int32)
    t = rng.standard_normal((e, 3)).astype(np.float32)
    info = np.stack([np.eye(3) * (1 + i) for i in range(e)]).astype(np.float32)
    si = np.asarray(sqrt_information(jnp.asarray(info)))
    prob = PoseGraphProblem(
        poses=jnp.asarray(poses),
        pose_mask=jnp.ones(k, bool),
        from_slot=jnp.asarray(fr),
        to_slot=jnp.asarray(to),
        T=jnp.asarray(t),
        sqrt_info=jnp.asarray(si),
        edge_mask=jnp.ones(e, bool),
    )
    got = np.asarray(residuals(jnp.asarray(poses), prob, jnp.float32(1.0)))
    for i in range(e):
        oracle = _np_residual(poses[fr[i]], poses[to[i]], t[i], si[i])
        np.testing.assert_allclose(got[i], oracle, atol=1e-4)


def test_exact_constraints_zero_cost(rng):
    prob, gt, k = _chain_problem(rng, noise=0.0, loop=True)
    poses, scale, cost = jax.jit(solve_pose_graph)(prob)
    assert float(cost) < 1e-8
    np.testing.assert_allclose(np.asarray(poses[:k]), gt, atol=1e-3)


def test_loop_closure_corrects_drift(rng):
    prob, gt, k = _chain_problem(rng, noise=0.03, loop=True)
    drift_before = np.linalg.norm(np.asarray(prob.poses[k - 1, :2]) - gt[k - 1, :2])
    poses, _, cost = solve_pose_graph(prob)
    drift_after = np.linalg.norm(np.asarray(poses[k - 1, :2]) - gt[k - 1, :2])
    # The exact loop edge must pull the endpoint (drifted by odometry noise)
    # substantially back toward ground truth.
    assert drift_after < 0.5 * drift_before
    # Base frame pinned.
    np.testing.assert_allclose(np.asarray(poses[0]), prob.poses[0], atol=1e-7)


def test_masked_slots_untouched(rng):
    prob, gt, k = _chain_problem(rng, noise=0.02, loop=True)
    poses, _, _ = solve_pose_graph(prob)
    np.testing.assert_array_equal(np.asarray(poses[k:]), np.asarray(prob.poses[k:]))


def test_scale_estimation_recovers_global_scale(rng):
    prob, gt, k = _chain_problem(rng, noise=0.0, loop=True)
    # Mis-scale every translation measurement by 1/1.3: the solver's free
    # scale variable must find s ≈ 1.3 to re-explain the (pinned-gauge) graph.
    prob = prob._replace(T=prob.T.at[:, :2].multiply(1 / 1.3))
    cfg = SolverConfig(estimate_scale=True)
    poses, scale, cost = solve_pose_graph(
        prob, cfg, init_scale=1.0, scale_free=True
    )
    # Gauge: only relative consistency is observable; with exact (rescaled)
    # constraints the cost must return to ~0 with a single consistent scale.
    assert float(cost) < 1e-6
    assert abs(float(scale) - 1.3) < 0.05


def test_scale_fixed_when_height_accurate(rng):
    prob, _, _ = _chain_problem(rng, noise=0.0, loop=True)
    prob = prob._replace(T=prob.T.at[:, :2].multiply(1 / 1.3))
    cfg = SolverConfig(estimate_scale=True)
    _, scale, _ = solve_pose_graph(prob, cfg, init_scale=1.0, scale_free=False)
    assert float(scale) == 1.0


def test_optimize_map_whitens_non_identity_information():
    """_optimize_map must whiten via the information Cholesky factor
    (reference pose_graph_2d.cc:74); with strongly anisotropic info on one
    edge the solution must move toward that edge's measurement relative to
    the identity-info solve (r1 passed raw info as sqrt_info — a silent
    wrong-result bug the moment info != I)."""
    import dataclasses

    import jax.numpy as jnp

    from nislam_tpu.core.camera import make_camera_ops
    from nislam_tpu.core.config import CameraConfig, CFConfig, MapConfig, SlamConfig
    from nislam_tpu.core.map_store import (
        add_edge,
        add_keyframe,
        make_edge_store,
        make_keyframe_bank,
    )
    from nislam_tpu.core.slam import _optimize_map

    cf = CFConfig(width=32, height=24, rotation_divisor=36, rotation_channel=16)
    mp = MapConfig(keyframe_capacity=4, edge_capacity=8, store_images=False)
    cam = make_camera_ops(CameraConfig(
        image_width=32, image_height=24, height=1.0,
        intrinsics=(1.0, 16.0, 1.0, 12.0),  # fx=1 -> camera frame == robot
    ))
    config = SlamConfig(cf=cf, map=mp, camera=CameraConfig(
        image_width=32, image_height=24, height=1.0,
        intrinsics=(1.0, 16.0, 1.0, 12.0),
    ))

    def bank_with_poses(poses):
        bank = make_keyframe_bank(cf, mp)
        for i, p in enumerate(poses):
            bank = add_keyframe(
                bank,
                fft=jnp.zeros((24, 17, 2)),
                polar_fft=jnp.zeros(cf.polar_shape[0:1] + (cf.polar_shape[1] // 2 + 1, 2)),
                image=jnp.zeros((0, 0)), pose=jnp.asarray(p, jnp.float32),
                frame_id=jnp.asarray(i, jnp.int32), distance=jnp.zeros(()),
                grid_scale=0.1, enabled=jnp.asarray(True),
            ).bank
        return bank

    # Two conflicting edges 0->1; x-measurements disagree (1.0 vs 2.0).
    def edges_with(info2):
        es = make_edge_store(mp)
        es = add_edge(es, from_slot=jnp.asarray(0), to_slot=jnp.asarray(1),
                      T=jnp.asarray([1.0, 0.0, 0.0]), edge_type=1,
                      enabled=jnp.asarray(True))
        es = add_edge(es, from_slot=jnp.asarray(0), to_slot=jnp.asarray(1),
                      T=jnp.asarray([2.0, 0.0, 0.0]), edge_type=1,
                      enabled=jnp.asarray(True), info=info2)
        return es

    bank = bank_with_poses([[0, 0, 0], [1.4, 0, 0]])
    eye = jnp.eye(3)
    poses_eq, _ = _optimize_map(bank, edges_with(eye), config, cam)
    # equal weights -> midpoint of the two measurements
    np.testing.assert_allclose(float(poses_eq[1, 0]), 1.5, atol=1e-3)

    heavy = jnp.diag(jnp.asarray([100.0, 1.0, 1.0]))  # trust edge 2's x 100x
    poses_w, _ = _optimize_map(bank, edges_with(heavy), config, cam)
    # info-weighted mean: (1*1 + 100*2)/101 = 1.990...
    np.testing.assert_allclose(float(poses_w[1, 0]), 201.0 / 101.0, atol=1e-3)
