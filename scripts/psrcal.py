"""PSR threshold calibration: measure how the peak-to-sidelobe ratio scales
with problem size on the synthetic workload (VERDICT r2 #4).

The reference's own tuning notes say the response thresholds must be tuned
with the problem size ("higher width*height -> higher threshold",
/root/reference/configs/config_geekplus.yaml:31-32) but give no law.  This
script measures it: run the tracker at several image sizes over the same
world/trajectory (in metric units) and report the tracked-frame PSR
distribution for translation (scales with W*H) and rotation (scales with
rotation_divisor*rotation_channel), plus the fitted power-law exponent of
median PSR vs pixel count.  The derived law feeds
``nislam_tpu.core.config.derive_response_thresholds``.

Usage: JAX_PLATFORMS=cpu python scripts/psrcal.py [--sizes 128 192 256 ...]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def run_size(h: int, w: int, n_frames: int, family: str = "gaussian") -> dict:
    import jax.numpy as jnp

    from nislam_tpu.core.config import (
        CameraConfig,
        CFConfig,
        KeyframeSelectionConfig,
        LoopClosureConfig,
        MapConfig,
        SlamConfig,
    )
    from nislam_tpu.core.slam import make_engine
    from nislam_tpu.utils.synthetic import (
        add_sensor_noise,
        heading_loop_path,
        make_world,
        render_sequence,
    )

    rd, rc = 360, max(96, h // 2)
    fx = float(w)
    px = 1.0 / fx
    step_px = w / 64.0  # constant *fraction of the view* per frame across sizes
    world_n = 1 << int(np.ceil(np.log2(4 * max(h, w))))
    config = SlamConfig(
        cf=CFConfig(width=w, height=h, rotation_divisor=rd, rotation_channel=rc),
        keyframe_selection=KeyframeSelectionConfig(
            max_distance=10.0 * step_px * px,
            max_angle=0.05236,
            # Thresholds irrelevant for measurement: set low so every frame
            # tracks and PSRs are recorded unconditionally.
            lower_response_thr=0.5,
            upper_response_thr=1.0,
        ),
        map=MapConfig(
            grid_scale=0.3 * h * px,
            keyframe_capacity=max(64, n_frames // 2),
            edge_capacity=4 * n_frames,
            store_images=False,
        ),
        loop_closure=LoopClosureConfig(to_find_loop=False),
        camera=CameraConfig(
            image_width=w, image_height=h, height=1.0,
            intrinsics=(fx, w / 2.0, fx, h / 2.0),
        ),
    )
    sigma = 1.5 if family == "powerlaw" else 3.0
    world = make_world(world_n, sigma, family=family)
    poses = heading_loop_path(
        n_frames, step=step_px, start=(world_n / 2.0, world_n / 2.0)
    )
    frames = add_sensor_noise(render_sequence(world, h, w, poses))
    engine = make_engine(config)
    state = engine.init_state()
    state, outs = engine.run_chunk(state, jnp.asarray(frames))
    resp = np.asarray(outs.response)
    tracked = np.asarray(outs.tracked).astype(bool)
    r = resp[tracked]
    return {
        "h": h, "w": w, "rd": rd, "rc": rc, "n": int(tracked.sum()),
        "trans_q10": float(np.quantile(r[:, 0], 0.1)),
        "trans_med": float(np.median(r[:, 0])),
        "trans_q90": float(np.quantile(r[:, 0], 0.9)),
        "rot_q10": float(np.quantile(r[:, 2], 0.1)),
        "rot_med": float(np.median(r[:, 2])),
        "rot_q90": float(np.quantile(r[:, 2], 0.9)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[96, 128, 192, 256, 384])
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument(
        "--families", nargs="+",
        default=["gaussian"],
        help="texture families to sweep (utils.synthetic.make_world); pass "
        "'gaussian powerlaw blobs fibrous' to check the law's "
        "texture-invariance (VERDICT r3 #7)",
    )
    args = ap.parse_args()

    for family in args.families:
        if len(args.families) > 1:
            print(f"--- family: {family} ---", flush=True)
        rows = []
        for s in args.sizes:
            row = run_size(s, s, args.frames, family=family)
            rows.append(row)
            print(
                f"{row['h']}x{row['w']} (n={row['n']}): "
                f"trans PSR q10/med/q90 = {row['trans_q10']:.2f}/"
                f"{row['trans_med']:.2f}/{row['trans_q90']:.2f} | "
                f"rot PSR q10/med/q90 = {row['rot_q10']:.2f}/"
                f"{row['rot_med']:.2f}/{row['rot_q90']:.2f}",
                flush=True,
            )

        if len(rows) >= 2:
            logn = np.log([r["h"] * r["w"] for r in rows])
            logp = np.log([r["trans_med"] for r in rows])
            slope = np.polyfit(logn, logp, 1)[0]
            print(f"fitted [{family}]: median translation PSR ~ (W*H)^{slope:.3f}")
            logr = np.log([r["rot_med"] for r in rows])
            slope_r = np.polyfit(logn, logr, 1)[0]
            print(f"        [{family}]: median rotation PSR ~ (W*H)^{slope_r:.3f} "
                  f"(rotation grid fixed at 360x(H/2) except tiny sizes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
