"""Camera model tests: undistortion remap vs OpenCV oracle, the numpy
fallback map generator vs cv2, and every 2D pose frame conversion
(/root/reference/src/camera.cc:92-242)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from nislam_tpu.core.camera import (
    _undistort_maps_numpy,
    make_camera_ops,
)
from nislam_tpu.core.config import CameraConfig

cv2 = pytest.importorskip("cv2")

W, H = 160, 120
DIST = (-0.28, 0.07, 1e-3, -2e-3, 0.0)  # k1 k2 p1 p2 k3 — realistic barrel


def _cfg(distortion=DIST, extrinsics=None, height=1.0):
    return CameraConfig(
        image_width=W,
        image_height=H,
        height=height,
        intrinsics=(150.0, 82.0, 148.0, 58.5),  # off-center principal point
        distortion=distortion,
        extrinsics=extrinsics
        or (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0),
    )


def test_undistort_matches_cv2_remap(rng):
    """Our bilinear-gather undistort equals cv2.remap(LINEAR) on the same
    maps — the reference's Camera::UndistortImage (camera.cc:92-103)."""
    cam = make_camera_ops(_cfg())
    assert not cam.identity_remap
    img = rng.random((H, W)).astype(np.float32)
    ours = np.asarray(cam.undistort(jnp.asarray(img)))
    oracle = cv2.remap(
        img,
        np.asarray(cam.map_x),
        np.asarray(cam.map_y),
        cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT,
        borderValue=0.0,
    )
    # Border rows/cols can differ in out-of-range handling; compare interior.
    np.testing.assert_allclose(ours[2:-2, 2:-2], oracle[2:-2, 2:-2], atol=1e-5)


def test_zero_distortion_is_identity(rng):
    cam = make_camera_ops(_cfg(distortion=(0.0,) * 5))
    assert cam.identity_remap
    img = rng.random((H, W)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(cam.undistort(jnp.asarray(img))), img)


def test_numpy_fallback_maps_match_cv2():
    """_undistort_maps_numpy (the no-cv2 fallback) reproduces
    getOptimalNewCameraMatrix(alpha=0) + initUndistortRectifyMap."""
    cfg = _cfg()
    m1n, m2n, kn = _undistort_maps_numpy(cfg)

    fx, cx, fy, cy = cfg.intrinsics
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    d = np.asarray(cfg.distortion, np.float64)
    new_k, _ = cv2.getOptimalNewCameraMatrix(k, d, (W, H), 0, (W, H))
    m1, m2 = cv2.initUndistortRectifyMap(k, d, None, new_k, (W, H), cv2.CV_32FC1)

    # The inner-rectangle estimate is iterative on both sides; allow a small
    # relative difference in the rectified intrinsics, then compare the maps
    # built from the SAME new_k exactly.
    np.testing.assert_allclose(kn, new_k, rtol=0.02, atol=0.5)
    m1r, m2r = cv2.initUndistortRectifyMap(k, d, None, kn, (W, H), cv2.CV_32FC1)
    np.testing.assert_allclose(m1n, m1r, atol=0.05)
    np.testing.assert_allclose(m2n, m2r, atol=0.05)


def test_frame_conversion_roundtrips(rng):
    """image-plane ↔ camera ↔ robot round-trips are exact inverses
    (camera.cc:136-242), with a non-trivial rotation extrinsic."""
    th_e = 0.6
    ext = (
        math.cos(th_e), -math.sin(th_e), 0.1,
        math.sin(th_e), math.cos(th_e), -0.2,
        0.0, 0.0, 1.0,
    )
    cam = make_camera_ops(_cfg(distortion=(0.0,) * 5, extrinsics=ext, height=0.37))
    poses = jnp.asarray(rng.standard_normal((7, 3)).astype(np.float32))

    ip = cam.camera_to_image_plane(cam.image_plane_to_camera(poses))
    np.testing.assert_allclose(np.asarray(ip), np.asarray(poses), atol=1e-5)
    rb = cam.camera_to_robot(cam.robot_to_camera(poses))
    np.testing.assert_allclose(np.asarray(rb), np.asarray(poses), atol=1e-5)
    full = cam.robot_to_image_plane(cam.image_plane_to_robot(poses))
    np.testing.assert_allclose(np.asarray(full), np.asarray(poses), atol=1e-4)


def test_camera_to_robot_applies_height_then_extrinsics():
    """camera.cc:197-211: metric scale by camera height, then the 2D rigid
    extrinsic (x, y via rotation+translation row, theta passes through the
    homogeneous third row)."""
    th_e = math.pi / 2.0
    ext = (
        math.cos(th_e), -math.sin(th_e), 0.5,
        math.sin(th_e), math.cos(th_e), 0.0,
        0.0, 0.0, 1.0,
    )
    cam = make_camera_ops(_cfg(distortion=(0.0,) * 5, extrinsics=ext, height=2.0))
    out = np.asarray(cam.camera_to_robot(jnp.asarray([1.0, 0.0, 0.3])))
    # height 2 scales x to 2; 90° extrinsic maps (2, 0) -> (0, 2); +t (0.5·θ, 0).
    np.testing.assert_allclose(out, [0.5 * 0.3, 2.0, 0.3], atol=1e-5)


def test_center_principal_correction():
    """ConvertCenterToPrincipal/ConvertPrincipalToCenter
    (camera.cc:136-158): exact inverses; identity at theta=0; at theta the
    correction is bias - R(theta)@bias about the rectified principal."""
    cam = make_camera_ops(_cfg(distortion=(0.0,) * 5))
    p0 = jnp.asarray([3.0, -4.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(cam.center_to_principal(p0)), np.asarray(p0), atol=1e-6
    )

    th = 0.7
    p = jnp.asarray([3.0, -4.0, th])
    got = np.asarray(cam.center_to_principal(p))
    bias = np.array([W / 2.0 - 82.0, H / 2.0 - 58.5])
    r = np.array(
        [[math.cos(th), -math.sin(th)], [math.sin(th), math.cos(th)]]
    )
    exp = np.asarray(p)[:2] + (bias - r @ bias)
    np.testing.assert_allclose(got[:2], exp, atol=1e-5)
    assert got[2] == pytest.approx(th)

    back = np.asarray(cam.principal_to_center(jnp.asarray(got)))
    np.testing.assert_allclose(back, np.asarray(p), atol=1e-5)


def test_length_of_pixel():
    """GetLengthOfPixel (camera.cc:129-134): mean metric size of one pixel
    step in u and v."""
    cam = make_camera_ops(_cfg(distortion=(0.0,) * 5, height=0.5))
    got = float(cam.length_of_pixel())
    exp = (0.5 / 150.0 + 0.5 / 148.0) / 2.0
    assert got == pytest.approx(exp, rel=1e-5)
