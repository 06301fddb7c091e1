"""One-compile profiling of the block engine on the bench config.

Times the SAME compiled run_blocks program under different dynamic inputs:
  a) bench-like moving sequence (keyframes + loops + optimizes fire)
  b) static sequence (no inserts -> loop-search / optimize conds never taken)
The difference apportions runtime between the always-on front end and the
insert-triggered branches without paying a second remote compile.
"""
from __future__ import annotations

import dataclasses
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nislam_tpu.core.config import (
        CFConfig, CameraConfig, KeyframeSelectionConfig, LoopClosureConfig,
        MapConfig, SlamConfig,
    )
    from nislam_tpu.core.slam import make_engine
    from nislam_tpu.utils.synthetic import heading_loop_path, make_world, render_sequence

    h, w, rd, rc = 256, 256, 360, 240
    n_frames = 256
    world_n, step_px = 2048, 4.0
    fx = float(w)
    px = 1.0 / fx
    config = SlamConfig(
        cf=CFConfig(width=w, height=h, rotation_divisor=rd, rotation_channel=rc),
        keyframe_selection=KeyframeSelectionConfig(
            max_distance=10.0 * step_px * px, max_angle=0.05236,
            lower_response_thr=4.0, upper_response_thr=6.0,
        ),
        map=MapConfig(
            grid_scale=0.3 * h * px,
            keyframe_capacity=max(256, n_frames // 2 + 16),
            edge_capacity=2 * n_frames,
            store_images=False, cache_filters=True,
        ),
        loop_closure=LoopClosureConfig(
            to_find_loop=True, position_response_thr=8.0, angle_response_thr=8.0,
            frame_gap_thr=30, distance_thr=16 * step_px * px, max_candidates=8,
        ),
        camera=CameraConfig(image_width=w, image_height=h, height=1.0,
                            intrinsics=(fx, w / 2.0, fx, h / 2.0)),
        lookahead=8,
    )
    engine = make_engine(config)

    world = make_world(world_n, 3.0)
    # Exactly n_frames of a rotating loop — no wrap/teleport (ADVICE r1).
    poses = heading_loop_path(n_frames, step=step_px, start=(world_n / 2.0, world_n / 2.0))
    frames = render_sequence(world, h, w, poses)
    static = np.broadcast_to(frames[0], frames.shape).copy()

    def run(fr, label, reps=3):
        fr = jax.block_until_ready(jnp.asarray(fr))  # pre-stage on device
        ts = []
        for _ in range(reps):
            state = engine.init_state()
            t0 = time.time()
            state, outs = engine.run_sequence(state, fr)
            ts.append(time.time() - t0)
        n_kf = int(np.asarray(state.bank.count))
        print(f"{label}: {min(ts):.3f}s best of {reps} ({[f'{t:.2f}' for t in ts]}) "
              f"kf={n_kf} loops={int(outs.loop_found.sum())} "
              f"opt={int(outs.optimized.sum())}", flush=True)

    t0 = time.time()
    x = jnp.asarray(frames)
    np.asarray(x[0, 0, 0])  # fence via readback (tunnel-safe)
    print(f"h2d {frames.nbytes/1e6:.0f}MB: {time.time() - t0:.2f}s", flush=True)
    del x  # don't pin an extra full frame-stack copy in HBM (ADVICE r1)

    t0 = time.time()
    state = engine.init_state()
    engine.run_sequence(state, frames)
    print(f"compile+warmup: {time.time() - t0:.1f}s", flush=True)

    run(frames, "moving (inserts+loops+optimize)")
    run(static, "static (front end only)")

    # no-loop-search config variant shares no compile; skip.

if __name__ == "__main__":
    sys.exit(main())
