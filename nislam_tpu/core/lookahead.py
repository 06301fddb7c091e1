"""Speculative block tracking: k frames per compiled step.

The per-frame pipeline is latency-bound on TPU — a batched rFFT2 over k
frames costs nearly the same as over one (measured: batch-8 == single on
v5e).  The only sequential dependency in the tracker is the keyframe chain
(SURVEY §7), and between keyframe insertions consecutive frames are
independent given the tracking target.  Block mode exploits this:

1. **Batched front end** — intermedium features, tracking registration
   against the *block keyframe*, and keyframe filters for all k frames run
   as single batched XLA ops.
2. **Sequential commit** — a tiny unrolled loop over the k per-frame
   results applies the reference's decision logic (PSR gating, keyframe
   conditions c1–c4, distance accumulation, edge/bank insertion) in order.
3. **Block epilogue** — the tracking target advances to the newest inserted
   keyframe; one loop-closure search + optimize trigger runs for it.

Documented deviations from lookahead=1 (exact reference semantics), both
bounded by the block length: frames register against a keyframe that may be
up to k−1 frames staler than the reference would use (still frame-to-
keyframe tracking — the keyframe decision thresholds bound the induced
drift), and at most one loop search runs per block.  With reference-like
keyframe spacing (every ≳10 frames) blocks rarely contain more than one
insertion and the trajectories are near-identical; the benchmark gates this
mode on ATE.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from nislam_tpu.core.camera import CameraOps
from nislam_tpu.core.config import SlamConfig
from nislam_tpu.core.loop_closure import LoopResult, find_loop_closure
from nislam_tpu.core.map_store import (
    EDGE_KCC,
    add_edge,
    add_keyframe,
    invalidate_edges,
)
from nislam_tpu.core.se2 import absolute_pose, relative_pose
from nislam_tpu.core.slam import (
    PendingLoops,
    SlamState,
    StepOutput,
    TrackState,
    _flush_pending_loops,
    _invalidate_pending,
    _stitch_online,
)
from nislam_tpu.core.stitcher import insert_frame
from nislam_tpu.ops.fft import c2r, r2c
from nislam_tpu.ops.registration import (
    CFOps,
    compute_intermedium,
    compute_keyframe_filters,
    compute_pose,
)


def slam_step_block(
    state: SlamState,
    images: jnp.ndarray,  # (k, H, W) f32
    valid: jnp.ndarray,  # (k,) bool — False lanes are padding (dropped)
    *,
    config: SlamConfig,
    cf_ops: CFOps,
    camera: CameraOps,
    defer_optimize: bool = False,
) -> Tuple[SlamState, StepOutput]:
    """Process a block of k frames; state must already be initialized
    (frame 0 goes through the single-frame step)."""
    k = images.shape[0]
    kfs = config.keyframe_selection
    lc_cfg = config.loop_closure
    track = state.track

    # ---- 1. batched front end --------------------------------------------
    imgs_u = camera.undistort(images)
    fft, polar = compute_intermedium(imgs_u, cf_ops)  # (k, ...)
    rel_center, response = compute_pose(
        r2c(track.last_fft)[None],
        imgs_u,
        r2c(track.last_polar)[None],
        polar,
        cf_ops,
        large_rotation=False,
        filters=(
            r2c(track.last_filt)[None],
            r2c(track.last_filt_polar)[None],
        ),
    )  # (k, 3), (k, 3)
    rel_principal = camera.center_to_principal(rel_center)
    fft_p = c2r(fft)
    polar_p = c2r(polar)

    # Block-keyframe cf pose: all registrations are relative to it.
    ref_cf = track.last_cf_pose
    cur_cf_all = absolute_pose(ref_cf[None], rel_principal)  # (k, 3)
    cur_cf_real_all = camera.image_plane_to_camera(cur_cf_all)
    rel_robot_all = relative_pose(
        camera.image_plane_to_robot(ref_cf)[None],
        camera.image_plane_to_robot(cur_cf_all),
    )
    good_all = jnp.logical_and(
        response[:, 0] > kfs.lower_response_thr,
        response[:, 2] > kfs.lower_response_thr,
    )
    c3_all = jnp.logical_and(
        response[:, 0] > kfs.lower_response_thr,
        response[:, 0] < kfs.upper_response_thr,
    )
    c4_all = jnp.logical_and(
        response[:, 2] > kfs.lower_response_thr,
        response[:, 2] < kfs.upper_response_thr,
    )

    # ---- 2. sequential commit (unrolled: tiny scalar ops) ---------------
    bank, edges, pending = state.bank, state.edges, state.pending
    canvas = state.canvas
    # chain state (advances on insertion within the block)
    last_cf = track.last_cf_pose
    last_cf_real = track.last_cf_real_pose
    last_pose = track.last_pose
    last_slot = track.last_slot
    distance = track.distance
    base_pose = track.last_pose  # robot pose of the block keyframe
    any_insert = jnp.asarray(False)
    idx_last = jnp.asarray(0, jnp.int32)
    slot_last = track.last_slot
    filt_last = track.last_filt
    filt_polar_last = track.last_filt_polar

    outs = []
    for i in range(k):
        fid = track.next_frame_id + i
        cur_cf = cur_cf_all[i]
        cur_cf_real = cur_cf_real_all[i]
        cur_pose = absolute_pose(base_pose, rel_robot_all[i])
        good = jnp.logical_and(good_all[i], valid[i])

        da_cam = camera.image_plane_to_camera(cur_cf - last_cf)
        d = jnp.linalg.norm(da_cam[:2])
        a = jnp.abs(da_cam[2])
        insert = jnp.logical_and(
            good, (d > kfs.max_distance) | (a > kfs.max_angle) | c3_all[i] | c4_all[i]
        )
        new_distance = distance + jnp.where(insert, d, 0.0)

        # Keyframe filters only when this lane inserts (4 transforms) —
        # computing them batched for all k lanes costs 4·k transforms per
        # block and dominated block mode once the front end got cheap
        # (docs/PROFILE_r2.md §3); inserts happen for ~1 frame in 5.
        fi_i, fp_i = jax.lax.cond(
            insert,
            lambda i=i: tuple(
                c2r(f)
                for f in compute_keyframe_filters(fft[i], polar[i], cf_ops)
            ),
            lambda: (filt_last, filt_polar_last),
        )
        bank, slot, stored, evicted = add_keyframe(
            bank,
            fft=fft_p[i],
            polar_fft=polar_p[i],
            filt=fi_i,
            filt_polar=fp_i,
            image=imgs_u[i],
            pose=cur_pose,
            frame_id=fid,
            distance=new_distance,
            grid_scale=config.map.grid_scale,
            enabled=insert,
            evict=config.map.eviction == "ring",
            protect_slot=last_slot,
        )
        rel_cf_real = relative_pose(last_cf_real, cur_cf_real)
        edges = invalidate_edges(edges, evicted)
        edges = add_edge(
            edges,
            from_slot=last_slot,
            to_slot=slot,
            T=rel_cf_real,
            edge_type=EDGE_KCC,
            enabled=stored,
        )
        pending = _invalidate_pending(pending, evicted)
        if _stitch_online(config):
            canvas = jax.lax.cond(
                stored,
                lambda cv, im=imgs_u[i], p=cur_pose: insert_frame(cv, im, p, camera),
                lambda cv: cv,
                canvas,
            )

        cf_out = relative_pose(
            camera.image_plane_to_robot(jnp.zeros(3, jnp.float32)),
            camera.image_plane_to_robot(cur_cf),
        )
        outs.append(
            StepOutput(
                tracked=good,
                inserted=insert,
                loop_found=jnp.asarray(False),  # block-level, patched below
                optimized=jnp.asarray(False),
                response=response[i],
                cf_pose=cf_out,
                pose=cur_pose,
                frame_id=fid,
                keyframe_slot=jnp.where(stored, slot, -1),
                loop_slot=jnp.asarray(-1, jnp.int32),
            )
        )

        # advance the chain on insertion
        last_cf = jnp.where(insert, cur_cf, last_cf)
        last_cf_real = jnp.where(insert, cur_cf_real, last_cf_real)
        last_pose = jnp.where(insert, cur_pose, last_pose)
        last_slot = jnp.where(stored, slot, last_slot)
        distance = new_distance
        idx_last = jnp.where(insert, i, idx_last)
        slot_last = jnp.where(stored, slot, slot_last)
        filt_last = jnp.where(insert, fi_i, filt_last)
        filt_polar_last = jnp.where(insert, fp_i, filt_polar_last)
        any_insert = jnp.logical_or(any_insert, insert)

    state = dataclasses.replace(
        state, bank=bank, edges=edges, pending=pending, canvas=canvas
    )

    # ---- 3. block epilogue ----------------------------------------------
    # Tracking target ← newest inserted keyframe (dynamic lane gather).
    def pick(arr_all, old):
        return jnp.where(
            any_insert, jax.lax.dynamic_index_in_dim(arr_all, idx_last, 0, False), old
        )

    new_track = TrackState(
        last_fft=pick(fft_p, track.last_fft),
        last_polar=pick(polar_p, track.last_polar),
        last_filt=filt_last,
        last_filt_polar=filt_polar_last,
        last_cf_pose=last_cf,
        last_cf_real_pose=last_cf_real,
        last_pose=last_pose,
        last_slot=last_slot,
        distance=distance,
        next_frame_id=track.next_frame_id + k,
        initialized=jnp.asarray(True),
    )
    state = dataclasses.replace(state, track=new_track)

    # One loop search per block for the newest keyframe.
    def do_search(_):
        return find_loop_closure(
            state.bank,
            jax.lax.dynamic_index_in_dim(imgs_u, idx_last, 0, False),
            r2c(pick(polar_p, track.last_polar)),
            track.next_frame_id + idx_last,
            distance,
            last_pose,
            cf_ops,
            lc_cfg,
            config.map.grid_scale,
        )

    def no_search(_):
        return LoopResult(
            found=jnp.asarray(False),
            loop_slot=jnp.asarray(0, jnp.int32),
            relative_pose=jnp.zeros(3, jnp.float32),
            response=jnp.zeros(3, jnp.float32),
        )

    if lc_cfg.to_find_loop:
        lc = jax.lax.cond(any_insert, do_search, no_search, None)
        loop_found = jnp.logical_and(any_insert, lc.found)
    else:
        lc = no_search(None)
        loop_found = jnp.asarray(False)

    pending = state.pending
    pslot = jnp.minimum(pending.count, pending.loop_slot.shape[0] - 1)
    padd = jnp.logical_and(loop_found, pending.count < pending.loop_slot.shape[0])
    rel_pp = camera.center_to_principal(lc.relative_pose)
    pending = PendingLoops(
        loop_slot=jnp.where(
            padd, pending.loop_slot.at[pslot].set(lc.loop_slot), pending.loop_slot
        ),
        cur_slot=jnp.where(
            padd, pending.cur_slot.at[pslot].set(slot_last), pending.cur_slot
        ),
        rel_pose=jnp.where(
            padd, pending.rel_pose.at[pslot].set(rel_pp), pending.rel_pose
        ),
        count=pending.count + padd.astype(jnp.int32),
    )
    state = dataclasses.replace(state, pending=pending)

    if defer_optimize:
        optimized = jnp.asarray(False)
    else:
        state, optimized = jax.lax.cond(
            jnp.logical_and(any_insert, ~loop_found),
            lambda st: _flush_pending_loops(st, config, camera),
            lambda st: (st, jnp.asarray(False)),
            state,
        )

    # Patch block-level flags onto the last-inserted lane's output.
    out = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
    lane = jnp.arange(k)
    is_last = jnp.logical_and(lane == idx_last, any_insert)
    out = out._replace(
        loop_found=jnp.logical_and(is_last, loop_found),
        optimized=jnp.logical_and(is_last, optimized),
        loop_slot=jnp.where(
            jnp.logical_and(is_last, loop_found), lc.loop_slot, -1
        ),
        pose=jnp.where(
            # After an optimize, the newest keyframe's pose was corrected.
            (jnp.logical_and(is_last, optimized))[:, None],
            state.bank.poses[slot_last][None],
            out.pose,
        ),
    )
    # Re-derive the chain from the optimized pose (UpdateValueAfterLoop).
    opt_pose = state.bank.poses[slot_last]
    tr = state.track
    tr = dataclasses.replace(
        tr,
        last_pose=jnp.where(optimized, opt_pose, tr.last_pose),
        last_cf_real_pose=jnp.where(
            optimized, camera.robot_to_camera(opt_pose), tr.last_cf_real_pose
        ),
        last_cf_pose=jnp.where(
            optimized,
            camera.camera_to_image_plane(camera.robot_to_camera(opt_pose)),
            tr.last_cf_pose,
        ),
    )
    state = dataclasses.replace(state, track=tr)
    return state, out
