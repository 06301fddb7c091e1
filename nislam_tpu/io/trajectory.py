"""Trajectory I/O (TUM format) and accuracy metrics (ATE RMSE).

The reference exports trajectories as ``time x y z qx qy qz qw`` text lines
(``Visualizer::GetTrajectoryTxt``, /root/reference/src/visualization.cc:
160-197, written by main.cpp:88-98 as ``KCC_Keyframe.txt`` and
``optimized_keyframe.txt``).  2D poses are lifted to 3D with a pure yaw
quaternion.  The metrics here implement the standard TUM ATE evaluation
(time association + SE(2)/Sim(2) alignment + RMSE) used by the BASELINE
configs — the reference project itself evaluated against Leica ground truth
offline (/root/reference/README.md:110-112).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np


def pose2d_to_tum_line(t: float, pose: Sequence[float]) -> str:
    """``time x y z qx qy qz qw`` with z=0 and a yaw-only quaternion."""
    x, y, th = float(pose[0]), float(pose[1]), float(pose[2])
    qz = math.sin(th / 2.0)
    qw = math.cos(th / 2.0)
    return (
        f"{t:.6f} {x:.6f} {y:.6f} 0.000000 0.000000 0.000000 "
        f"{qz:.6f} {qw:.6f}"
    )


def write_tum(path: str, times: Sequence[float], poses: np.ndarray) -> str:
    with open(path, "w") as f:
        for t, pose in zip(times, poses):
            f.write(pose2d_to_tum_line(t, pose) + "\n")
    return path


def read_tum(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (times (N,), poses (N, 3) as (x, y, yaw))."""
    times: List[float] = []
    poses: List[Tuple[float, float, float]] = []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            vals = [float(v) for v in ln.split()]
            t, x, y, _z, qx, qy, qz, qw = vals[:8]
            yaw = math.atan2(
                2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy * qy + qz * qz)
            )
            times.append(t)
            poses.append((x, y, yaw))
    return np.asarray(times), np.asarray(poses)


def associate(
    times_a: np.ndarray, times_b: np.ndarray, max_dt: float = 0.02
) -> Tuple[np.ndarray, np.ndarray]:
    """Nearest-timestamp association (TUM tooling semantics): for each a,
    the closest b within ``max_dt``; greedy unique matches."""
    ia: List[int] = []
    ib: List[int] = []
    used = set()
    order = np.argsort(times_a)
    for i in order:
        j = int(np.argmin(np.abs(times_b - times_a[i])))
        if abs(times_b[j] - times_a[i]) <= max_dt and j not in used:
            ia.append(i)
            ib.append(j)
            used.add(j)
    return np.asarray(ia, int), np.asarray(ib, int)


def umeyama_2d(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = False
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares 2D alignment dst ≈ s·R·src + t (Umeyama).

    Returns (R (2,2), t (2,), s).  ``with_scale=False`` gives rigid SE(2)
    alignment (the monocular-with-known-height setting); ``True`` gives
    Sim(2) for scale-free evaluation.
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    u, d, vt = np.linalg.svd(cov)
    s_mat = np.eye(2)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s_mat[1, 1] = -1.0
    r = u @ s_mat @ vt
    if with_scale:
        var = (xs * xs).sum() / len(src)
        s = float((d * np.diag(s_mat)).sum() / var)
    else:
        s = 1.0
    t = mu_d - s * r @ mu_s
    return r, t, s


def ate_rmse(
    est_times: np.ndarray,
    est_xy: np.ndarray,
    gt_times: np.ndarray,
    gt_xy: np.ndarray,
    *,
    max_dt: float = 0.02,
    align: bool = True,
    with_scale: bool = False,
) -> float:
    """Absolute trajectory error RMSE (m) after association (+ alignment)."""
    ia, ib = associate(est_times, gt_times, max_dt)
    if len(ia) < 2:
        raise ValueError("fewer than 2 associated trajectory points")
    e = np.asarray(est_xy)[ia, :2]
    g = np.asarray(gt_xy)[ib, :2]
    if align:
        r, t, s = umeyama_2d(e, g, with_scale)
        e = (s * (r @ e.T)).T + t
    d = e - g
    return float(np.sqrt((d * d).sum(axis=1).mean()))
