"""Synthetic ground-texture worlds and trajectory rendering.

The reference validates on real warehouse-floor footage (README.md:110-112);
for hermetic tests and benchmarks we synthesize the equivalent: a large
smooth random texture ("ground"), and a downward camera rendered at SE(2)
poses by bilinear sampling — the exact imaging model the KCC front end
assumes.  Used by the integration tests (SURVEY §4b) and ``bench.py``.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

# Pure NumPy on purpose: rendering is host-side test/bench data generation.
# Dispatching it as eager device ops is pathological on tunneled backends
# (one RPC round-trip per primitive), so no jax imports here.


def make_world(n: int = 1024, sigma: float = 3.0, seed: int = 42) -> np.ndarray:
    """Smooth periodic random texture in [0, 1] — correlates like real
    ground texture (high-frequency but spatially coherent)."""
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, n)).astype(np.float32)
    # Separable periodic Gaussian blur (no scipy dependency).
    r = int(3 * sigma)
    k = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2).astype(np.float32)
    k /= k.sum()
    f = np.fft.rfft2(w)
    kx = np.fft.rfft(np.roll(np.pad(k, (0, n - k.size)), -r))
    ky = np.fft.fft(np.roll(np.pad(k, (0, n - k.size)), -r))
    w = np.fft.irfft2(f * ky[:, None] * kx[None, :], s=(n, n)).astype(np.float32)
    w -= w.min()
    w /= w.max()
    return w


def render_frame(
    world: np.ndarray, h: int, w: int, px: float, py: float, theta: float
) -> np.ndarray:
    """Render an (h, w) downward-camera view at world-pixel pose
    (px, py, theta): bilinear sampling of the periodic world."""
    wh, ww = world.shape
    xs = np.arange(w, dtype=np.float64) - w / 2.0
    ys = np.arange(h, dtype=np.float64) - h / 2.0
    xg, yg = np.meshgrid(xs, ys)
    c, s = math.cos(theta), math.sin(theta)
    wx = px + c * xg - s * yg
    wy = py + s * xg + c * yg
    x0 = np.floor(wx).astype(np.int64)
    y0 = np.floor(wy).astype(np.int64)
    fx = (wx - x0).astype(np.float32)
    fy = (wy - y0).astype(np.float32)
    x0 %= ww
    y0 %= wh
    x1 = (x0 + 1) % ww
    y1 = (y0 + 1) % wh
    v00 = world[y0, x0]
    v01 = world[y0, x1]
    v10 = world[y1, x0]
    v11 = world[y1, x1]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)


def render_sequence(
    world: np.ndarray, h: int, w: int, poses: Sequence[Tuple[float, float, float]]
) -> np.ndarray:
    world = np.asarray(world)
    return np.stack([render_frame(world, h, w, *p) for p in poses])


def square_loop_path(
    side_steps: int = 25,
    step: float = 6.0,
    start: Tuple[float, float] = (512.0, 512.0),
    tail: int = 4,
    yaw_rate: float = 0.0,
) -> List[Tuple[float, float, float]]:
    """Axis-aligned square loop returning to start, then a tail continuing in
    the last side's direction — i.e. *away* from every visited cell, so that
    after the tail leaves the loop region the next keyframes find no loop and
    the ≥2-pending optimize trigger can fire."""
    poses = [(start[0], start[1], 0.0)]
    x, y, th = poses[0]
    for dx, dy in [(1, 0), (0, 1), (-1, 0), (0, -1)]:
        for _ in range(side_steps):
            x += dx * step
            y += dy * step
            th += yaw_rate
            poses.append((x, y, th))
    for _ in range(tail):
        y -= step
        poses.append((x, y, th))
    return poses


def straight_path(
    n: int, step: float = 6.0, start: Tuple[float, float] = (512.0, 512.0)
) -> List[Tuple[float, float, float]]:
    return [(start[0] + i * step, start[1], 0.0) for i in range(n)]
