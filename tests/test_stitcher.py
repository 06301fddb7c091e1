"""Map stitcher tests: rasterization geometry, averaging, recompute."""

import math

import numpy as np

import jax.numpy as jnp

from nislam_tpu.core.camera import make_camera_ops
from nislam_tpu.core.config import CameraConfig, CFConfig, MapConfig, MapStitcherConfig
from nislam_tpu.core.map_store import add_keyframe, make_keyframe_bank
from nislam_tpu.core.stitcher import (
    StitchCanvas,
    insert_frame,
    make_canvas,
    map_resolution,
    occupancy_grid,
    occupancy_origin,
    recompute,
)

H, W = 16, 24
CAM = CameraConfig(
    image_width=W, image_height=H, height=1.0,
    intrinsics=(100.0, W / 2.0, 100.0, H / 2.0),
)
CFG = MapStitcherConfig(canvas_size=128)


def _camera():
    return make_camera_ops(CAM)


def _np_raster(image, image_pose):
    """NumPy oracle of AddImageToOccupancy's coordinate map
    (/root/reference/src/map_stitcher.cc:44-111)."""
    h, w = image.shape
    th = image_pose[2]
    r = np.array([[math.cos(th), -math.sin(th)], [math.sin(th), math.cos(th)]])
    data = {}
    for j in range(h):
        for i in range(w):
            x = r[0, 0] * (i - w / 2.0) + r[0, 1] * (j - h / 2.0) + image_pose[0]
            y = r[1, 0] * (i - w / 2.0) + r[1, 1] * (j - h / 2.0) + image_pose[1]
            xi, yi = int(x), int(y)  # C truncation
            s, c = data.get((xi, yi), (0.0, 0))
            data[(xi, yi)] = (s + image[j, i] * 100.0, c + 1)
    return data


def test_insert_matches_numpy_oracle(rng):
    cam = _camera()
    img = rng.random((H, W), dtype=np.float32)
    pose_robot = np.array([0.05, -0.03, 0.3], np.float32)  # 5, -3 px, 0.3 rad
    canvas = insert_frame(make_canvas(CFG), jnp.asarray(img), jnp.asarray(pose_robot), cam)

    # Oracle in image-plane pixels (principal point at center → the robot
    # pose maps to pixels by ×fx=×100).
    image_pose = np.array([5.0, -3.0, 0.3])
    oracle = _np_raster(img, image_pose)
    data = np.asarray(canvas.data)
    wts = np.asarray(canvas.weight)
    half = CFG.canvas_size // 2
    for (xi, yi), (s, c) in oracle.items():
        np.testing.assert_allclose(data[yi + half, xi + half], s, atol=1e-2)
        assert wts[yi + half, xi + half] == c
    assert wts.sum() == H * W


def test_identity_insert_copies_image(rng):
    cam = _camera()
    img = rng.random((H, W), dtype=np.float32)
    canvas = insert_frame(make_canvas(CFG), jnp.asarray(img), jnp.zeros(3), cam)
    half = CFG.canvas_size // 2
    block = np.asarray(canvas.data)[
        half - H // 2 : half + H // 2, half - W // 2 : half + W // 2
    ]
    np.testing.assert_allclose(block, img * 100.0, atol=1e-3)


def test_weighted_average_and_occupancy(rng):
    cam = _camera()
    a = np.full((H, W), 0.2, np.float32)
    b = np.full((H, W), 0.6, np.float32)
    canvas = make_canvas(CFG)
    canvas = insert_frame(canvas, jnp.asarray(a), jnp.zeros(3), cam)
    canvas = insert_frame(canvas, jnp.asarray(b), jnp.zeros(3), cam)
    grid = np.asarray(occupancy_grid(canvas))
    half = CFG.canvas_size // 2
    # mean intensity = 40 → occupancy 60; unseen → −1.
    assert grid[half, half] == 60
    assert grid[0, 0] == -1


def test_recompute_equals_incremental(rng):
    cam = _camera()
    cf = CFConfig(width=W, height=H, rotation_divisor=36, rotation_channel=16)
    map_cfg = MapConfig(keyframe_capacity=4, edge_capacity=8)
    bank = make_keyframe_bank(cf, map_cfg)
    canvas_inc = make_canvas(CFG)
    poses = [np.zeros(3), np.array([0.03, 0.02, 0.4])]
    for k, pose in enumerate(poses):
        img = rng.random((H, W), dtype=np.float32)
        bank = add_keyframe(
            bank,
            fft=jnp.zeros((H, W // 2 + 1), jnp.complex64),
            polar_fft=jnp.zeros((cf.polar_shape[0], cf.polar_shape[1] // 2 + 1), jnp.complex64),
            image=jnp.asarray(img),
            pose=jnp.asarray(pose, jnp.float32),
            frame_id=jnp.asarray(k, jnp.int32),
            distance=jnp.zeros(()),
            grid_scale=0.1,
            enabled=jnp.asarray(True),
        ).bank
        canvas_inc = insert_frame(canvas_inc, jnp.asarray(img), jnp.asarray(pose, jnp.float32), cam)
    canvas_re = recompute(make_canvas(CFG), bank, cam)
    np.testing.assert_allclose(
        np.asarray(canvas_re.data), np.asarray(canvas_inc.data), atol=1e-3
    )
    np.testing.assert_array_equal(
        np.asarray(canvas_re.weight), np.asarray(canvas_inc.weight)
    )


def test_origin_and_resolution():
    cam = _camera()
    canvas = make_canvas(CFG)
    # 1 px = height/f = 0.01 m; corner at (−64, −64) px → (−0.64, −0.64) m.
    np.testing.assert_allclose(np.asarray(occupancy_origin(cam, canvas)), [-0.64, -0.64], atol=1e-6)
    np.testing.assert_allclose(float(map_resolution(cam)), 0.01, atol=1e-8)


def test_online_stitching_matches_on_demand():
    """Engine-integrated stitching (MapStitcherConfig.online): insert on
    keyframe + recompute after optimize (map_builder.cc:62,113).  After the
    final optimize the live canvas must equal an on-demand recompute from
    the bank, and it must be populated during the run."""
    import dataclasses

    from nislam_tpu.core.config import (
        KeyframeSelectionConfig,
        LoopClosureConfig,
        SlamConfig,
    )
    from nislam_tpu.core.slam import make_engine
    from nislam_tpu.utils.synthetic import heading_loop_path, make_world, render_sequence

    h, w = 48, 64
    cfg = SlamConfig(
        cf=CFConfig(width=w, height=h, rotation_divisor=180, rotation_channel=48),
        keyframe_selection=KeyframeSelectionConfig(
            max_distance=0.10, max_angle=0.05,
            lower_response_thr=4.0, upper_response_thr=6.0,
        ),
        map=MapConfig(grid_scale=0.15, keyframe_capacity=64, edge_capacity=256,
                      store_images=True),
        loop_closure=LoopClosureConfig(
            to_find_loop=True, position_response_thr=8.0, angle_response_thr=8.0,
            frame_gap_thr=20, distance_thr=0.8, max_candidates=4,
        ),
        map_stitcher=MapStitcherConfig(canvas_size=256, online=True),
        camera=CameraConfig(
            image_width=w, image_height=h, height=1.0,
            intrinsics=(100.0, w / 2.0, 100.0, h / 2.0),
        ),
    )
    world = make_world(512, 3.0)
    frames = render_sequence(
        world, h, w, heading_loop_path(40, step=3.0, start=(256.0, 256.0), tail=6)
    )
    engine = make_engine(cfg)
    state = engine.init_state()
    state, outs = engine.run_sequence(state, jnp.asarray(frames), chunk_frames=16)
    state, _ = engine.finalize(state)
    assert np.asarray(state.canvas.weight).sum() > 0  # populated during run
    ondemand = recompute(
        StitchCanvas(
            data=jnp.zeros_like(state.canvas.data),
            weight=jnp.zeros_like(state.canvas.weight),
        ),
        state.bank,
        engine.camera,
    )
    # Equal whether or not a solve ran: inserts use insert-time poses, and
    # any optimize triggers a full recompute from the (updated) bank poses.
    del outs
    np.testing.assert_allclose(
        np.asarray(state.canvas.data), np.asarray(ondemand.data), atol=1e-2
    )
    np.testing.assert_array_equal(
        np.asarray(state.canvas.weight), np.asarray(ondemand.weight)
    )


def test_online_stitching_exact_under_ring_eviction():
    """With store_images, ring eviction subtracts the evicted keyframe's
    contribution at eviction time (ADVICE r2 #3): the live online canvas
    equals recompute(bank) even after the bank overruns capacity."""
    from nislam_tpu.core.config import (
        KeyframeSelectionConfig,
        LoopClosureConfig,
        SlamConfig,
    )
    from nislam_tpu.core.slam import make_engine
    from nislam_tpu.utils.synthetic import make_world, render_sequence, straight_path

    h, w = 48, 64
    cfg = SlamConfig(
        cf=CFConfig(width=w, height=h, rotation_divisor=180, rotation_channel=48),
        keyframe_selection=KeyframeSelectionConfig(
            max_distance=0.06, max_angle=0.05,
            lower_response_thr=4.0, upper_response_thr=6.0,
        ),
        # Tiny capacity: a straight path inserts ~1-in-2 keyframes, so 60
        # frames overrun 8 slots several times over.
        map=MapConfig(grid_scale=0.15, keyframe_capacity=8, edge_capacity=64,
                      store_images=True, eviction="ring"),
        loop_closure=LoopClosureConfig(to_find_loop=False),
        map_stitcher=MapStitcherConfig(canvas_size=256, online=True),
        camera=CameraConfig(
            image_width=w, image_height=h, height=1.0,
            intrinsics=(100.0, w / 2.0, 100.0, h / 2.0),
        ),
    )
    world = make_world(512, 3.0)
    frames = render_sequence(
        world, h, w, straight_path(60, step=3.0, start=(256.0, 256.0))
    )
    engine = make_engine(cfg)
    state = engine.init_state()
    state, outs = engine.run_sequence(state, jnp.asarray(frames), chunk_frames=20)
    assert int(state.bank.overflow) > 0  # evictions actually happened
    ondemand = recompute(
        StitchCanvas(
            data=jnp.zeros_like(state.canvas.data),
            weight=jnp.zeros_like(state.canvas.weight),
        ),
        state.bank,
        engine.camera,
    )
    np.testing.assert_allclose(
        np.asarray(state.canvas.weight), np.asarray(ondemand.weight), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(state.canvas.data), np.asarray(ondemand.data), atol=1e-2
    )


def test_insert_frame_sign_subtract_cancels(rng):
    """insert then subtract the same frame restores the canvas exactly up
    to float cancellation."""
    from nislam_tpu.core.config import CameraConfig

    cam = make_camera_ops(CameraConfig(
        image_width=16, image_height=12, height=1.0,
        intrinsics=(100.0, 8.0, 100.0, 6.0),
    ))
    canvas = StitchCanvas(
        data=jnp.asarray(rng.random((64, 64)).astype(np.float32)),
        weight=jnp.asarray(rng.integers(0, 3, (64, 64)).astype(np.float32)),
    )
    img = jnp.asarray(rng.random((12, 16)).astype(np.float32))
    pose = jnp.asarray([0.05, -0.03, 0.4])
    added = insert_frame(canvas, img, pose, cam)
    restored = insert_frame(added, img, pose, cam, sign=-1.0)
    np.testing.assert_allclose(
        np.asarray(restored.data), np.asarray(canvas.data), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(restored.weight), np.asarray(canvas.weight), atol=1e-6
    )


def test_canvas_center_offset(rng):
    """A canvas centered on (cx, cy) captures content there that an
    origin-centered canvas of the same size would clip, with
    occupancy_origin shifted accordingly."""
    import dataclasses

    import jax.numpy as jnp

    from nislam_tpu.core.camera import make_camera_ops
    from nislam_tpu.core.config import CameraConfig, MapStitcherConfig
    from nislam_tpu.core.stitcher import (
        insert_frame,
        make_canvas,
        occupancy_grid,
        occupancy_origin,
    )

    cam = make_camera_ops(CameraConfig(
        image_width=16, image_height=12, height=1.0,
        intrinsics=(100.0, 8.0, 100.0, 6.0),
    ))
    img = jnp.asarray(rng.random((12, 16)).astype(np.float32))
    # robot pose far from the origin: 1.0 m -> 100 image-plane px
    pose = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)

    off = make_canvas(MapStitcherConfig(canvas_size=64))
    off = insert_frame(off, img, pose, cam)
    assert float(off.weight.sum()) == 0.0  # clipped entirely

    cfg = MapStitcherConfig(canvas_size=64, canvas_center=(100, 100))
    cen = make_canvas(cfg)
    cen = insert_frame(cen, img, pose, cam)
    assert float(cen.weight.sum()) == 12 * 16  # all pixels landed
    g = np.asarray(occupancy_grid(cen))
    assert (g >= 0).sum() > 0
    # origin shifts by the center offset (0.01 m/px)
    o0 = np.asarray(occupancy_origin(cam, off))
    o1 = np.asarray(occupancy_origin(cam, cen))
    np.testing.assert_allclose(o1 - o0, [1.0, 1.0], atol=1e-5)
