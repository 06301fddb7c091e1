"""Visual odometry model: frame-to-keyframe KCC tracking, no back end.

BASELINE configs 1-2 (fr1/xyz clip, fr2/desk full sequence): the engine
with loop closure disabled — the pose chain is pure closed-form front-end
output, matching the reference run with ``to_find_loop: false``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nislam_tpu.core.config import SlamConfig
from nislam_tpu.core.slam import SlamEngine, SlamState, StepOutput, make_engine


@dataclasses.dataclass(frozen=True)
class VisualOdometry:
    """Thin wrapper pinning loop closure off."""

    config: SlamConfig

    @property
    def engine(self) -> SlamEngine:
        return self._engine

    def __post_init__(self):
        cfg = dataclasses.replace(
            self.config,
            loop_closure=dataclasses.replace(
                self.config.loop_closure, to_find_loop=False
            ),
        )
        object.__setattr__(self, "_engine", make_engine(cfg))

    def init_state(self) -> SlamState:
        return self._engine.init_state()

    def step(self, state: SlamState, image) -> Tuple[SlamState, StepOutput]:
        return self._engine.step(state, image)

    def run(self, images) -> Tuple[SlamState, StepOutput]:
        """Track a whole (N, H, W) sequence on device."""
        state = self._engine.init_state()
        return self._engine.run_chunk(state, jnp.asarray(images))

    def trajectory(self, outs: StepOutput) -> np.ndarray:
        """(N, 3) raw KCC odometry in the robot frame (GetCFPose chain)."""
        return np.asarray(outs.cf_pose)

    def evaluate(
        self, images, *, times=None, gt_xy=None, gt_times=None,
        chunk_frames: int = 64
    ) -> "EvalResult":
        """BASELINE configs 1-2: pure-VO throughput + ATE on a sequence.

        Runs the whole (N, H, W) sequence through the chunked on-device
        driver, fences with a host readback, and scores the RAW odometry
        chain (no back end) against ``gt_xy`` (N, 2) when given.  This is
        the model-level entry the eval CLI and docs call — the number that
        corresponds to a reference run with ``to_find_loop: false``.
        """
        import time as _time

        images = jnp.asarray(images)
        n = int(images.shape[0])
        state = self._engine.init_state()
        t0 = _time.time()
        state, outs = self._engine.run_sequence(
            state, images, chunk_frames=chunk_frames, numpy_outputs=False
        )
        traj = np.asarray(outs.cf_pose)  # fences the device work
        dt = _time.time() - t0
        outs = jax.tree.map(np.asarray, outs)
        return _evaluate_outputs(
            outs, n, dt, times, gt_xy, traj,
            int(np.asarray(state.bank.count)), gt_times=gt_times,
        )


@dataclasses.dataclass(frozen=True)
class EvalResult:
    """One BASELINE-style evaluation record (frames/s + ATE + tracking)."""

    frames: int
    fps: float
    ate_rmse_m: float | None
    tracked_frac: float
    keyframes: int
    trajectory: np.ndarray  # (N, 3) estimated poses (robot frame)


def _evaluate_outputs(outs, n, dt, times, gt_xy, traj, n_kf, gt_times=None):
    from nislam_tpu.io.trajectory import ate_rmse

    ate = None
    if gt_xy is not None:
        t = np.asarray(times) if times is not None else np.arange(n) / 30.0
        gt_xy = np.asarray(gt_xy)
        # real gt timestamps when given (timestamp association); otherwise
        # index alignment (synthetic gt generated per frame)
        gt_t = np.asarray(gt_times) if gt_times is not None else t[: len(gt_xy)]
        try:
            ate = ate_rmse(t[: len(traj)], traj[:, :2], gt_t, gt_xy)
        except ValueError:
            ate = None
    return EvalResult(
        frames=n,
        fps=n / dt if dt > 0 else float("inf"),
        ate_rmse_m=ate,
        tracked_frac=float(np.asarray(outs.tracked).mean()),
        keyframes=n_kf,
        trajectory=traj,
    )
