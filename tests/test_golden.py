"""Golden-file regression on trajectory output (SURVEY §4e).

A fixed synthetic sequence must reproduce the checked-in keyframe
trajectory (format parity with the reference's ``KCC_Keyframe.txt`` /
``optimized_keyframe.txt`` dumps, /root/reference/main.cpp:88-98).  Guards
against silent behavior drift in the full pipeline: registration math,
keyframe decisions, loop closure, optimizer, coordinate conversions.
Regenerate intentionally with: python tests/test_golden.py
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_trajectory.txt")


def _run():
    from nislam_tpu.core.config import (
        CFConfig,
        CameraConfig,
        KeyframeSelectionConfig,
        LoopClosureConfig,
        MapConfig,
        SlamConfig,
    )
    from nislam_tpu.core.slam import make_engine
    from nislam_tpu.utils.synthetic import heading_loop_path, make_world, render_sequence

    H, W = 96, 128
    config = SlamConfig(
        cf=CFConfig(width=W, height=H, rotation_divisor=360, rotation_channel=96),
        keyframe_selection=KeyframeSelectionConfig(
            max_distance=0.10, max_angle=0.05,
            lower_response_thr=4.0, upper_response_thr=6.0,
        ),
        map=MapConfig(grid_scale=0.15, keyframe_capacity=128, edge_capacity=512),
        loop_closure=LoopClosureConfig(
            to_find_loop=True, position_response_thr=8.0, angle_response_thr=8.0,
            frame_gap_thr=30, distance_thr=1.0, max_candidates=8,
        ),
        camera=CameraConfig(
            image_width=W, image_height=H, height=1.0,
            intrinsics=(100.0, W / 2.0, 100.0, H / 2.0),
        ),
    )
    # Rotating loop (full 360° of yaw) through the default deferred-optimize
    # chunked driver — the golden freezes rotation handling too (VERDICT r1).
    world = make_world(1024, 3.0, seed=1234)
    frames = render_sequence(world, H, W, heading_loop_path(100, step=5.5, tail=10))
    engine = make_engine(config)
    state = engine.init_state()
    state, outs = engine.run_sequence(state, jnp.asarray(frames), chunk_frames=32)
    state, _ = engine.finalize(state)
    outs = jax.tree.map(np.asarray, outs)
    kf = outs.keyframe_slot[outs.keyframe_slot >= 0]
    poses = np.asarray(state.bank.poses)[kf]
    flags = np.stack(
        [outs.inserted, outs.loop_found, outs.optimized], axis=-1
    ).astype(int)
    return poses, flags


def _write_golden(poses, flags):
    with open(GOLDEN, "w") as f:
        f.write("# keyframe poses (x y theta) then per-frame flags (ins loop opt)\n")
        f.write(f"poses {len(poses)}\n")
        for p in poses:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        f.write(f"flags {len(flags)}\n")
        for fl in flags:
            f.write(f"{fl[0]} {fl[1]} {fl[2]}\n")


def _read_golden():
    with open(GOLDEN) as f:
        lines = [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]
    i = 0
    assert lines[i].startswith("poses")
    n = int(lines[i].split()[1])
    poses = np.asarray([[float(v) for v in lines[i + 1 + j].split()] for j in range(n)])
    i += 1 + n
    assert lines[i].startswith("flags")
    m = int(lines[i].split()[1])
    flags = np.asarray([[int(v) for v in lines[i + 1 + j].split()] for j in range(m)])
    return poses, flags


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden file not generated")
def test_trajectory_matches_golden():
    poses, flags = _run()
    g_poses, g_flags = _read_golden()
    assert len(poses) == len(g_poses), (len(poses), len(g_poses))
    np.testing.assert_array_equal(flags, g_flags)
    np.testing.assert_allclose(poses, g_poses, atol=2e-3)


if __name__ == "__main__":
    p, fl = _run()
    _write_golden(p, fl)
    print(f"wrote {GOLDEN}: {len(p)} keyframes, {len(fl)} frames")
