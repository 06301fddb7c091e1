"""Standalone KCC registration model: pairwise and batched image alignment.

The bare registration engine (reference L1, ``CorrelationFlow``) exposed as
a user-facing model: give it two images (or a batch of pairs) and get back
the relative (x, y, θ) in pixels/radians plus PSR confidences — no SLAM
state involved.  This is the "data association" primitive the reference
evaluates against ORB/SIFT (/root/reference/README.md:157-161).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from nislam_tpu.core.config import CFConfig
from nislam_tpu.ops.registration import (
    CFOps,
    compute_intermedium,
    compute_pose,
    make_cf_ops,
)


@dataclasses.dataclass(frozen=True)
class KCCRegistration:
    """Jitted pairwise registration at a fixed image size."""

    cfg: CFConfig

    @functools.cached_property
    def ops(self) -> CFOps:
        return make_cf_ops(self.cfg)

    @functools.cached_property
    def _register(self):
        # ops is a jit argument, not a closure constant (see SlamEngine note).
        @functools.partial(jax.jit, static_argnames=("large_rotation",))
        def fn(ref, cur, ops, large_rotation: bool = False):
            ref_fft, ref_polar = compute_intermedium(ref, ops)
            _, cur_polar = compute_intermedium(cur, ops)
            return compute_pose(
                ref_fft, cur, ref_polar, cur_polar, ops,
                large_rotation=large_rotation,
            )

        return lambda ref, cur, large_rotation=False: fn(
            ref, cur, self.ops, large_rotation=large_rotation
        )

    def register(
        self, reference: jnp.ndarray, current: jnp.ndarray, *,
        large_rotation: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Relative pose of ``current`` w.r.t. ``reference``.

        Returns ``(pose, response)``: pose = (x_px, y_px, θ_rad) with the
        reference's sign conventions (correlation_flow.cc:134-140);
        response = (psr_t, psr_t, psr_rot).  ``large_rotation=True``
        resolves the 180° power-spectrum ambiguity by testing both
        hypotheses (loop-closure mode).
        """
        return self._register(reference, current, large_rotation=large_rotation)

    @functools.cached_property
    def _register_batch(self):
        @functools.partial(jax.jit, static_argnames=("large_rotation",))
        def fn(refs, curs, ops, large_rotation: bool = False):
            ref_fft, ref_polar = compute_intermedium(refs, ops)
            _, cur_polar = compute_intermedium(curs, ops)
            return compute_pose(
                ref_fft, curs, ref_polar, cur_polar, ops,
                large_rotation=large_rotation,
            )

        return lambda refs, curs, large_rotation=False: fn(
            refs, curs, self.ops, large_rotation=large_rotation
        )

    def register_batch(
        self, references: jnp.ndarray, currents: jnp.ndarray, *,
        large_rotation: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched: (B, H, W) × (B, H, W) → ((B, 3), (B, 3)) in one XLA
        program — B pairs cost one batched FFT pipeline, not B serial ones."""
        return self._register_batch(
            references, currents, large_rotation=large_rotation
        )
