"""Visual odometry model: frame-to-keyframe KCC tracking, no back end.

BASELINE configs 1-2 (fr1/xyz clip, fr2/desk full sequence): the engine
with loop closure disabled — the pose chain is pure closed-form front-end
output, matching the reference run with ``to_find_loop: false``.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nislam_tpu.core.config import LoopClosureConfig, SlamConfig
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
