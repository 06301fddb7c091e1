"""Unit tests for loop-closure gating & the exhaustive-search overload."""

import numpy as np

import jax.numpy as jnp

from nislam_tpu.core.config import CFConfig, LoopClosureConfig, MapConfig
from nislam_tpu.core.loop_closure import (
    _gating_mask,
    find_loop_closure,
    find_loop_closure_all,
)
from nislam_tpu.core.map_store import add_keyframe, make_keyframe_bank
from nislam_tpu.ops.registration import (
    compute_intermedium,
    compute_keyframe_filters,
    make_cf_ops,
)
from nislam_tpu.utils.synthetic import make_world, render_frame

H, W = 64, 96
CF = CFConfig(width=W, height=H, rotation_divisor=90, rotation_channel=48)
MAP = MapConfig(grid_scale=0.1, keyframe_capacity=8, edge_capacity=16)


def _bank_with(world, poses_px, frame_ids, distances, map_cfg=MAP):
    ops = make_cf_ops(CF)
    bank = make_keyframe_bank(CF, map_cfg)
    for (px, py), fid, dist in zip(poses_px, frame_ids, distances):
        img = jnp.asarray(render_frame(world, H, W, px, py, 0.0))
        fft, polar = compute_intermedium(img, ops)
        fi, fp = compute_keyframe_filters(fft, polar, ops)
        bank = add_keyframe(
            bank,
            fft=fft,
            polar_fft=polar,
            filt=fi,
            filt_polar=fp,
            image=img,
            pose=jnp.asarray([(px - 256.0) * 0.01, (py - 256.0) * 0.01, 0.0], jnp.float32),
            frame_id=jnp.asarray(fid, jnp.int32),
            distance=jnp.asarray(dist, jnp.float32),
            grid_scale=map_cfg.grid_scale,
            enabled=jnp.asarray(True),
        ).bank
    return bank, ops


def test_gating_mask_thresholds():
    frame_ids = jnp.asarray([0, 50, 90, 100])
    distances = jnp.asarray([0.0, 2.0, 4.0, 6.0])

    cand = jnp.ones(4, bool)
    cfg = LoopClosureConfig(frame_gap_thr=60, distance_thr=3.0)
    m = _gating_mask(frame_ids, distances, jnp.asarray(100), jnp.asarray(6.0), cand, cfg)
    # gap: |100-id| >= 60 keeps ids 0, 40?: [100,50,10,0] -> keeps 0; dist:
    # |6-d| >= 3 keeps d in {0,2,3?}: [6,4,2,0] -> keeps 0.0, 2.0(4>=3), not 4.0(2<3), not 6.0
    np.testing.assert_array_equal(np.asarray(m), [True, False, False, False])
    # thresholds <= 0 disable the gates (reference's `> 0` checks)
    cfg0 = LoopClosureConfig(frame_gap_thr=0, distance_thr=0.0)
    m0 = _gating_mask(frame_ids, distances, jnp.asarray(100), jnp.asarray(6.0), cand, cfg0)
    np.testing.assert_array_equal(np.asarray(m0), [True] * 4)


def test_find_loop_closure_all_scans_whole_bank():
    """The exhaustive overload (loop_closure.cc:10-15) ignores the spatial
    hash: a revisit far outside the 3×3 neighborhood is still found."""
    world = make_world(512, 3.0)
    # Keyframes at 256 and at 400 (1.44 m away — way outside 3×3 grid cells
    # of 0.1 m); query revisits the FIRST location.
    bank, ops = _bank_with(
        world, [(256.0, 256.0), (400.0, 256.0)], [0, 50], [0.0, 5.0]
    )
    img = jnp.asarray(render_frame(world, H, W, 258.0, 256.0, 0.0))
    _, polar = compute_intermedium(img, ops)
    cfg = LoopClosureConfig(
        frame_gap_thr=60, distance_thr=1.0,
        position_response_thr=8.0, angle_response_thr=8.0, max_candidates=8,
    )
    res = find_loop_closure_all(
        bank, img, polar, jnp.asarray(100, jnp.int32), jnp.asarray(9.0, jnp.float32),
        ops, cfg,
    )
    assert bool(res.found)
    assert int(res.loop_slot) == 0
    # displacement ~2 px in x
    assert abs(float(res.relative_pose[0]) - 2.0) <= 1.5

    # The gated search with a prior at the *wrong* place finds nothing.
    res2 = find_loop_closure(
        bank, img, polar, jnp.asarray(100, jnp.int32), jnp.asarray(9.0, jnp.float32),
        jnp.asarray([5.0, 5.0, 0.0], jnp.float32), ops, cfg, MAP.grid_scale,
    )
    assert not bool(res2.found)


def test_truncated_search_prioritizes_prior_proximity():
    """Dense revisit: more eligible candidates than max_candidates, with the
    true match sitting at a HIGH slot.  Slot-order truncation (r3 behavior)
    would exclude it; prior-proximity priority must include and find it,
    and eligible_count must expose the truncation (VERDICT r3 weak #3)."""
    world = make_world(512, 3.0)
    # 11 keyframes in one tight cluster (all within one 0.1 m grid cell);
    # slots 0..9 at offsets around (250, 250), the true revisit target LAST
    # (slot 10) at (280, 262) — furthest down the slot order.
    poses = [(250.0 + i, 250.0 + i, ) for i in range(10)] + [(280.0, 262.0)]
    bank, ops = _bank_with(
        world, poses, list(range(0, 11)), [0.01 * i for i in range(11)],
        map_cfg=MapConfig(grid_scale=1.0, keyframe_capacity=16, edge_capacity=16),
    )
    img = jnp.asarray(render_frame(world, H, W, 281.0, 262.0, 0.0))
    _, polar = compute_intermedium(img, ops)
    cfg = LoopClosureConfig(
        frame_gap_thr=0, distance_thr=0.0,  # gates off: all 11 eligible
        position_response_thr=8.0, angle_response_thr=4.0, max_candidates=4,
    )
    # prior pose at the true revisit location (robot frame of _bank_with)
    prior = jnp.asarray([(280.0 - 256.0) * 0.01, (262.0 - 256.0) * 0.01, 0.0],
                        jnp.float32)
    res = find_loop_closure(
        bank, img, polar, jnp.asarray(100, jnp.int32),
        jnp.asarray(9.0, jnp.float32), prior, ops, cfg, 1.0,  # big cells
    )
    assert int(res.eligible_count) == 11  # truncation visible: 11 > 4
    assert bool(res.found)
    assert int(res.loop_slot) == 10  # proximity priority reached slot 10
    assert abs(float(res.relative_pose[0]) - 1.0) <= 1.5


def test_coarse_fine_search_matches_exact_decision():
    """coarse_scale=2: the coarse-ranked search picks the same candidate,
    accepts, and reports the SAME pose/response as the exact search (the
    winner's registration is full-resolution in both)."""
    import dataclasses

    world = make_world(512, 3.0)
    # 4 keyframes: three distractors far in content, one true revisit.
    poses = [(150.0, 150.0), (350.0, 150.0), (150.0, 350.0), (280.0, 262.0)]
    bank, ops = _bank_with(
        world, poses, [0, 10, 20, 30], [0.0, 1.0, 2.0, 3.0],
        map_cfg=MapConfig(grid_scale=10.0, keyframe_capacity=8, edge_capacity=16),
    )
    img = jnp.asarray(render_frame(world, H, W, 283.0, 264.0, 0.0))
    cur_fft, polar = compute_intermedium(img, ops)
    base_cfg = LoopClosureConfig(
        frame_gap_thr=0, distance_thr=0.0,
        position_response_thr=8.0, angle_response_thr=4.0, max_candidates=8,
    )
    prior = jnp.asarray([(280.0 - 256.0) * 0.01, (262.0 - 256.0) * 0.01, 0.0],
                        jnp.float32)
    args = (bank, img, polar, jnp.asarray(100, jnp.int32),
            jnp.asarray(9.0, jnp.float32), prior, ops)
    exact = find_loop_closure(*args, base_cfg, 10.0, cur_fft=cur_fft)
    coarse = find_loop_closure(
        *args, dataclasses.replace(base_cfg, coarse_scale=2), 10.0,
        cur_fft=cur_fft,
    )
    assert bool(exact.found) and bool(coarse.found)
    assert int(coarse.loop_slot) == int(exact.loop_slot) == 3
    np.testing.assert_allclose(
        np.asarray(coarse.relative_pose), np.asarray(exact.relative_pose),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(coarse.response), np.asarray(exact.response), rtol=1e-5
    )
    assert int(coarse.eligible_count) == int(exact.eligible_count)

    # cur_fft omitted: the coarse path computes it itself, same result.
    coarse2 = find_loop_closure(
        *args, dataclasses.replace(base_cfg, coarse_scale=2), 10.0
    )
    assert int(coarse2.loop_slot) == 3 and bool(coarse2.found)


def test_spectral_crop_oracle(rng):
    """spectral_crop == full-spectrum crop oracle (sinc downsampling)."""
    from nislam_tpu.ops.fft import irfft2, rfft2, spectral_crop

    x = rng.standard_normal((24, 32)).astype(np.float32)
    got = np.asarray(irfft2(spectral_crop(rfft2(jnp.asarray(x)), (24, 32), 2), (12, 16)))
    # oracle: crop the full FFT to the lowest 12x16 frequencies, zero the
    # Nyquist row/col, inverse, scale 1/4
    F = np.fft.fft2(x)
    Fc = np.zeros((12, 16), complex)
    Fc[:7, :9] = F[:7, :9]
    Fc[7:, :9] = F[-5:, :9]
    Fc[:, 9:] = np.conj(Fc[:, 1:8][:, ::-1])[np.r_[0, 11:0:-1], :]
    Fc[6, :] = 0
    Fc[:, 8] = 0
    oracle = np.fft.ifft2(Fc).real / 4.0
    np.testing.assert_allclose(got, oracle, atol=1e-5)
