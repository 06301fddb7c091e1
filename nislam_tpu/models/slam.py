"""Full SLAM model: tracking + loop closure + pose graph + map stitching.

The complete system of the reference (MapBuilder + LoopClosure +
optimization_2d + MapStitcher, BASELINE config 3) behind one object, with
the occupancy mosaic produced on demand from the keyframe bank.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nislam_tpu.core.config import SlamConfig
from nislam_tpu.core.slam import SlamEngine, SlamState, StepOutput, make_engine
from nislam_tpu.core.stitcher import (
    StitchCanvas,
    make_canvas,
    map_resolution,
    occupancy_grid,
    occupancy_origin,
    recompute,
)


@dataclasses.dataclass(frozen=True)
class FullSlam:
    config: SlamConfig

    def __post_init__(self):
        object.__setattr__(self, "_engine", make_engine(self.config))

    @property
    def engine(self) -> SlamEngine:
        return self._engine

    def init_state(self) -> SlamState:
        return self._engine.init_state()

    def step(self, state: SlamState, image) -> Tuple[SlamState, StepOutput]:
        return self._engine.step(state, image)

    def run(self, images, state: Optional[SlamState] = None):
        """Process an (N, H, W) sequence + final optimize; returns
        (state, outputs, final_optimize_ran)."""
        if state is None:
            state = self._engine.init_state()
        state, outs = self._engine.run_sequence(state, jnp.asarray(images))
        state, ran = self._engine.finalize(state)
        return state, outs, ran

    # -- mapping (MapStitcher + occupancy export) -------------------------
    def stitch(self, state: SlamState) -> StitchCanvas:
        """The occupancy canvas: the live one when stitching online
        (map_builder.cc:62,113 semantics), else rasterized on demand.

        With ``map.store_images`` the online engine subtracts an evicted
        keyframe's contribution at eviction time (negated scatter of the
        old bank record, ADVICE r2 #3), so the live canvas equals
        ``recompute(bank)`` at all times and is returned directly.  Without
        stored images the subtraction is impossible — pixels of evicted
        keyframes linger until the next solve-triggered recompute — so once
        any eviction has occurred the export re-rasterizes from the live
        bank instead (which itself requires stored images; store_images=False
        with ring eviction cannot produce an eviction-exact mosaic).
        """
        if not self.config.map_stitcher.stitch_map:
            raise ValueError("map_stitcher.stitch_map is disabled in config")
        stale_inclusive = (
            self.config.map.eviction == "ring"
            and not self.config.map.store_images
            and int(state.bank.overflow) > 0
        )
        if (
            self.config.map_stitcher.online
            and state.canvas.size
            and not stale_inclusive
        ):
            return state.canvas
        return recompute(
            make_canvas(self.config.map_stitcher), state.bank, self._engine.camera
        )

    def occupancy(self, state: SlamState):
        """(grid int8, origin_xy (2,), resolution) — the OccupancyGrid
        triple of /root/reference/src/visualization.cc:131-150."""
        canvas = self.stitch(state)
        return (
            np.asarray(occupancy_grid(canvas)),
            np.asarray(occupancy_origin(self._engine.camera, canvas)),
            float(map_resolution(self._engine.camera)),
        )

    def keyframe_poses(self, state: SlamState) -> np.ndarray:
        """(K, 3) optimized keyframe poses (GetFramePoses)."""
        k = int(state.bank.count)
        return np.asarray(state.bank.poses[:k])

    def evaluate(
        self, images, *, times=None, gt_xy=None, gt_times=None,
        chunk_frames: int = 64
    ) -> "SlamEvalResult":
        """BASELINE config 3: the full system (tracking + loop closure +
        pose graph) on a sequence, scored on the OPTIMIZED keyframe poses.

        Returns a :class:`SlamEvalResult` whose ``ate_rmse_m`` associates
        keyframe poses with ``gt_xy`` (N, 2) by frame index — the honest
        post-loop-correction accuracy, matching what the reference's
        ``optimized_keyframe.txt`` dump evaluates to.
        """
        import time as _time

        import jax

        from nislam_tpu.io.trajectory import ate_rmse

        from nislam_tpu.core.slam import chunked_deferred_drive

        images = jnp.asarray(images)
        n = int(images.shape[0])
        state = self._engine.init_state()
        tally: list = []
        t0 = _time.time()
        if self.config.optimizer.inline:
            state, outs = self._engine.run_sequence(
                state, images, chunk_frames=chunk_frames, numpy_outputs=False
            )
        else:
            state, outs = chunked_deferred_drive(
                self._engine, state, images, chunk_frames=chunk_frames,
                numpy_outputs=False, solve_tally=tally,
            )
        state, _ran = self._engine.finalize(state)
        kf_poses = np.asarray(state.bank.poses)  # fences
        dt = _time.time() - t0
        outs = jax.tree.map(np.asarray, outs)
        t = np.asarray(times) if times is not None else np.arange(n) / 30.0
        idx = np.where(outs.keyframe_slot >= 0)[0]
        slots = outs.keyframe_slot[idx]
        # Ring eviction recycles slots: a keyframe's slot only still holds
        # ITS pose if the bank's frame_id at that slot matches the frame
        # that inserted it — drop evicted keyframes from the scored
        # trajectory (their poses are gone by design).
        bank_fids = np.asarray(state.bank.frame_ids)
        live = bank_fids[slots] == outs.frame_id[idx]
        idx, slots = idx[live], slots[live]
        traj = kf_poses[slots]
        ate = None
        if gt_xy is not None:
            gt_xy = np.asarray(gt_xy)
            gt_t = (np.asarray(gt_times) if gt_times is not None
                    else t[: len(gt_xy)])
            keep = idx < len(gt_xy) if gt_times is None else np.ones(len(idx), bool)
            try:
                ate = ate_rmse(t[idx[keep]], traj[keep][:, :2], gt_t, gt_xy)
            except ValueError:
                ate = None
        return SlamEvalResult(
            frames=n,
            fps=n / dt if dt > 0 else float("inf"),
            ate_rmse_m=ate,
            tracked_frac=float(outs.tracked.mean()),
            keyframes=int(np.asarray(state.bank.count)),
            loops=int(outs.loop_found.sum()),
            solves=int(outs.optimized.sum())
            + sum(int(np.asarray(r)) for r in tally)
            + int(_ran),
            keyframe_trajectory=traj,
        )


@dataclasses.dataclass(frozen=True)
class SlamEvalResult:
    """Full-system evaluation record (BASELINE config 3)."""

    frames: int
    fps: float
    ate_rmse_m: float | None
    tracked_frac: float
    keyframes: int
    loops: int
    solves: int
    keyframe_trajectory: np.ndarray  # (K_used, 3) optimized keyframe poses
