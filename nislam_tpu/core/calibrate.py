"""Per-deployment threshold calibration from real frames (VERDICT r4 #8).

``derive_response_thresholds`` scales the reference's 640×480 anchors by
the measured √area law — correct across problem SIZES, but the anchor
itself is texture-dependent: across texture families the matched-PSR
level spreads ~4× (docs/TEXTURES_r4.md), so a thin-margin texture (e.g.
powerlaw ground) can sit dangerously close to thresholds derived for the
gaussian-family anchor.  This module closes the loop automatically
(``nislam_tpu calibrate`` / ``run --calibrate``): it measures the matched
and no-match PSR anchors on the first K frames of the ACTUAL dataset,
measures the same probe on the synthetic gaussian anchor texture at the
same config, and rescales the derived thresholds by the texture ratio.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def measure_psr_anchors(config, images: np.ndarray) -> Dict[str, float]:
    """Matched + no-match PSR anchors of ``images`` under ``config``.

    Matched pairs are consecutive frames (the tracking registration the
    thresholds gate); no-match pairs are maximally-separated frames —
    VALID ONLY when the camera moves at least a frame-width over the
    probe window (a slow camera's "separated" frames still overlap; the
    caller checks the ``nomatch_suspect`` diagnostic and warns).
    Returns medians and deciles of translation and rotation PSR for both
    populations.
    """
    import jax
    import jax.numpy as jnp

    from nislam_tpu.core.camera import make_camera_ops
    from nislam_tpu.ops.registration import (
        compute_intermedium,
        compute_pose,
        make_cf_ops,
    )

    cf_ops = make_cf_ops(config.cf)
    camera = make_camera_ops(config.camera)
    n = images.shape[0]
    if n < 4:
        raise ValueError(f"calibration needs ≥4 frames, got {n}")

    @jax.jit
    def pair_info(a, b):
        if a.dtype == jnp.uint8:
            a = a.astype(jnp.float32) / 255.0
            b = b.astype(jnp.float32) / 255.0
        ua = camera.undistort(a)
        ub = camera.undistort(b)
        fa, pa = compute_intermedium(ua, cf_ops)
        _, pb = compute_intermedium(ub, cf_ops)
        _, info = compute_pose(fa, ub, pa, pb, cf_ops, large_rotation=False)
        return info

    imgs = jnp.asarray(images)
    matched_t, matched_r, garbage_t, garbage_r = [], [], [], []
    for i in range(n - 1):
        info = np.asarray(pair_info(imgs[i], imgs[i + 1]))
        matched_t.append(float(info[0]))
        matched_r.append(float(info[2]))
    half = n // 2
    for i in range(min(half, 8)):
        info = np.asarray(pair_info(imgs[i], imgs[i + half]))
        garbage_t.append(float(info[0]))
        garbage_r.append(float(info[2]))
    mt = np.asarray(matched_t)
    mr = np.asarray(matched_r)
    gt = np.asarray(garbage_t)
    gr = np.asarray(garbage_r)
    return {
        "matched_t_median": float(np.median(mt)),
        "matched_t_q10": float(np.quantile(mt, 0.1)),
        "matched_r_median": float(np.median(mr)),
        "matched_r_q10": float(np.quantile(mr, 0.1)),
        "nomatch_t_q90": float(np.quantile(gt, 0.9)),
        "nomatch_r_q90": float(np.quantile(gr, 0.9)),
        # "no-match" frames that still correlate like matches ⇒ the probe
        # window is too short for this camera's speed — the separation
        # diagnostics are then meaningless (but the matched anchors and
        # the threshold rescale remain valid).
        "nomatch_suspect": bool(
            np.quantile(gt, 0.5) > 0.5 * np.median(mt)
        ),
        "pairs": int(n - 1),
    }


def _synthetic_anchor(config, n_frames: int = 12) -> Dict[str, float]:
    """The same probe on the gaussian-family synthetic anchor texture at
    this config — the texture `derive_response_thresholds`'s anchors were
    calibrated on (scripts/psrcal.py)."""
    from nislam_tpu.utils.synthetic import (
        make_world,
        render_sequence,
        straight_path,
    )

    h, w = config.cf.height, config.cf.width
    world_n = 1 << int(np.ceil(np.log2(4 * max(h, w))))
    world = make_world(world_n, 3.0, seed=7)
    step = max(2.0, w / 32.0)
    frames = render_sequence(
        world, h, w,
        straight_path(n_frames, step=step, start=(world_n / 2.0,) * 2),
    ).astype(np.float32)
    return measure_psr_anchors(config, frames)


def calibrate_thresholds(
    config, images: np.ndarray
) -> Tuple[Dict[str, float], Dict[str, float]]:
    """Texture-rescaled thresholds + diagnostics.

    The derived (√area-law) thresholds are multiplied by the ratio of the
    dataset's matched-PSR median to the synthetic gaussian anchor's at
    the same config — the anchor correction the law itself cannot supply.
    Ratios are clamped to [0.25, 4] (beyond that the texture is likely
    untrackable — e.g. the powerlaw-α≥1.5 rotation cliff — and thresholds
    are not the fix).  Returns ``(thresholds, diagnostics)``.
    """
    from nislam_tpu.core.config import derive_response_thresholds

    data = measure_psr_anchors(config, images)
    synth = _synthetic_anchor(config)
    rt = float(np.clip(data["matched_t_median"] / max(synth["matched_t_median"], 1e-6), 0.25, 4.0))
    rr = float(np.clip(data["matched_r_median"] / max(synth["matched_r_median"], 1e-6), 0.25, 4.0))
    base = derive_response_thresholds(
        config.cf.width, config.cf.height,
        config.cf.rotation_divisor, config.cf.rotation_channel,
    )
    thr = {
        "lower_response_thr": round(base["lower_response_thr"] * rt, 2),
        "upper_response_thr": round(base["upper_response_thr"] * rt, 2),
        "lower_rotation_response_thr": round(
            base["lower_rotation_response_thr"] * rr, 2
        ),
        "upper_rotation_response_thr": round(
            base["upper_rotation_response_thr"] * rr, 2
        ),
        "position_response_thr": round(base["position_response_thr"] * rt, 2),
        "angle_response_thr": round(base["angle_response_thr"] * rr, 2),
    }
    diag = {
        **{f"data_{k}": v for k, v in data.items()},
        **{f"synth_{k}": v for k, v in synth.items()},
        "texture_ratio_translation": round(rt, 3),
        "texture_ratio_rotation": round(rr, 3),
        # tracking-gate margin: q10 of matched PSR over the lower gate
        # (>1 = the gate admits ≥90% of genuinely matched frames)
        "margin_tracking": round(
            data["matched_t_q10"] / max(thr["lower_response_thr"], 1e-6), 2
        ),
        "margin_rotation": round(
            data["matched_r_q10"]
            / max(thr["lower_rotation_response_thr"], 1e-6),
            2,
        ),
        # separation: no-match q90 must sit BELOW the loop gates
        "separation_position": round(
            thr["position_response_thr"] / max(data["nomatch_t_q90"], 1e-6), 2
        ),
        "separation_angle": round(
            thr["angle_response_thr"] / max(data["nomatch_r_q90"], 1e-6), 2
        ),
    }
    return thr, diag


def apply_thresholds(config, thr: Dict[str, float]):
    """A copy of ``config`` with the calibrated thresholds installed."""
    import dataclasses

    return dataclasses.replace(
        config,
        keyframe_selection=dataclasses.replace(
            config.keyframe_selection,
            lower_response_thr=thr["lower_response_thr"],
            upper_response_thr=thr["upper_response_thr"],
            lower_rotation_response_thr=thr["lower_rotation_response_thr"],
            upper_rotation_response_thr=thr["upper_rotation_response_thr"],
        ),
        loop_closure=dataclasses.replace(
            config.loop_closure,
            position_response_thr=thr["position_response_thr"],
            angle_response_thr=thr["angle_response_thr"],
        ),
    )
