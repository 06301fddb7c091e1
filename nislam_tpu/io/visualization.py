"""Offline visualization: trajectory plots and occupancy-map images.

The reference publishes to rviz over ROS (/root/reference/src/
visualization.cc: raw image, KCC path, optimized keyframe path, occupancy
grid).  ROS transport is an explicit non-goal (SURVEY §7); the equivalent
artifacts here are files: a trajectory figure (matplotlib) and the stitched
occupancy map as a PNG — produced at the end of a run or on demand.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def save_trajectory_plot(
    path: str,
    kcc_xy: np.ndarray,
    optimized_xy: Optional[np.ndarray] = None,
    gt_xy: Optional[np.ndarray] = None,
    loop_pairs: Optional[Sequence[tuple]] = None,
) -> str:
    """Plot raw KCC odometry vs optimized keyframe path (vs ground truth)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    if gt_xy is not None:
        ax.plot(gt_xy[:, 0], gt_xy[:, 1], "-", color="0.6", lw=1.5, label="ground truth")
    ax.plot(kcc_xy[:, 0], kcc_xy[:, 1], "-", lw=1.0, label="KCC odometry")
    if optimized_xy is not None:
        ax.plot(
            optimized_xy[:, 0], optimized_xy[:, 1], "-", lw=1.0,
            label="optimized keyframes",
        )
    if loop_pairs:
        for (a, b) in loop_pairs:
            ax.plot([a[0], b[0]], [a[1], b[1]], "r-", lw=0.5, alpha=0.6)
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.legend(loc="best", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
    return path


def save_occupancy_png(path: str, grid: np.ndarray) -> str:
    """Occupancy grid (int8, −1 unseen / 0..100) → grayscale PNG.

    Unseen → mid-gray 128 (rviz-like), occupancy 0..100 → 255..0.
    """
    g = np.asarray(grid, np.int16)
    img = np.where(g < 0, 128, (100 - np.clip(g, 0, 100)) * 255 // 100).astype(
        np.uint8
    )
    try:
        import cv2

        cv2.imwrite(path, img)
    except ImportError:
        from PIL import Image

        Image.fromarray(img).save(path)
    return path
