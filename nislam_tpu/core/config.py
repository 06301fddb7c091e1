"""Config system mirroring the reference YAML schema.

Parity with ``include/read_configs.h`` (struct fields) and
``src/camera.cc:20-75`` (camera YAML).  All config dataclasses are frozen
and hashable so they can be static arguments to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class DatasetConfig:
    """/root/reference/include/read_configs.h:9-13."""

    dataroot: str = ""
    image_dir_name: str = ""
    camera_file: str = ""


@dataclasses.dataclass(frozen=True)
class CFConfig:
    """KCC engine parameters — /root/reference/include/read_configs.h:15-25.

    ``lambda_`` is the ridge regularizer λ; ``kernel`` selects 0=polynomial /
    1=gaussian (/root/reference/src/correlation_flow.cc:157-169).
    """

    width: int = 640
    height: int = 480
    lambda_: float = 0.1
    kernel: int = 0
    sigma: float = 0.2
    offset: float = 0.1
    power: int = 3
    rotation_divisor: int = 720
    rotation_channel: int = 480
    # De-rotation resampler: "fft" (3-shear Fourier rotation — TPU-fast,
    # sinc interpolation) or "bilinear" (gather — bit-parity with the
    # reference's cv::warpAffine, ~20× slower on TPU).  "fft" silently
    # falls back to bilinear for odd image sizes.
    rotate_method: str = "fft"
    # Exploit the exact π-periodicity of the power-spectrum polar map: the
    # magnitude spectrum of a real image is centro-symmetric, so rows d and
    # d + divisor/2 of the reference's polar map are identical up to float
    # rounding (this is WHY the 180° ambiguity exists,
    # /root/reference/src/correlation_flow.cc:107-132).  With ``half_polar``
    # the engine samples only the first divisor/2 rows (angles [0, π)) and
    # runs the whole rotation registration at half size — halving the polar
    # gather, the polar FFTs, the rotation-correlation transforms, and the
    # bank's polar-spectrum HBM — while recovering the identical rotation
    # mod 180° (measured bit-equal across a ±180° sweep; the mod-180
    # representative is all the reference ever extracts, since tracking
    # folds |deg|>90 and loop mode tries both hypotheses).  Angle resolution
    # is unchanged (still 360/divisor °/bin).  The rotation PSR is
    # recalibrated to full-grid units by the measured
    # HALF_POLAR_PSR_SCALE (ops.registration) — exact for matched peaks to
    # within the measured ±10% band; NO-match responses (which measure
    # ≈equal on both grids) come out ~1.2× higher than full-polar, so
    # near-threshold rotation gates are marginally more permissive than
    # the reference's tuning.  Silently falls back to the full map for odd
    # divisors.
    half_polar: bool = True
    # Polar resample implementation: "quad" (one gather index per output
    # into a quad-packed 2×2-footprint view — 4× fewer descriptors, but
    # materializes a 4× copy of the power array), "4tap" (four direct
    # gathers, no materialization), or "auto": quad below ~1 Mpx images,
    # 4tap above (at the HD config the quad pack writes+reads ~30 MB per
    # frame and loses; measured r5).  Outputs identical up to border-
    # cell summation order (last-ulp; tested at 1e-6).
    polar_taps: str = "auto"

    @property
    def half_polar_active(self) -> bool:
        return self.half_polar and self.rotation_divisor % 2 == 0

    @property
    def polar_shape(self) -> Tuple[int, int]:
        """Effective (rows, cols) of the polar representation the engine
        computes, stores, and correlates — ``(divisor/2, channel)`` under
        :attr:`half_polar_active`, else ``(divisor, channel)``."""
        d = self.rotation_divisor
        return (d // 2 if self.half_polar_active else d, self.rotation_channel)


@dataclasses.dataclass(frozen=True)
class KeyframeSelectionConfig:
    """/root/reference/include/read_configs.h:27-32.

    The reference applies one (lower, upper) PSR band to both the
    translation response and the rotation response
    (map_builder.cc:48-52) — valid there because every reference config
    fixes the polar grid at 720×480, the size those thresholds were tuned
    at.  Rotation PSR scales with the polar grid, not the image
    (scripts/psrcal.py), so configs with a different grid need a
    separately scaled rotation band; ``None`` (default) falls back to the
    translation band (exact reference behavior)."""

    max_distance: float = 0.4
    max_angle: float = 0.052359877
    lower_response_thr: float = 30.0
    upper_response_thr: float = 90.0
    lower_rotation_response_thr: float | None = None
    upper_rotation_response_thr: float | None = None

    @property
    def lower_rot(self) -> float:
        v = self.lower_rotation_response_thr
        return self.lower_response_thr if v is None else v

    @property
    def upper_rot(self) -> float:
        v = self.upper_rotation_response_thr
        return self.upper_response_thr if v is None else v


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """/root/reference/include/read_configs.h:34-36 plus TPU capacities.

    The reference's stores grow unboundedly (SURVEY §5); the TPU build uses
    preallocated HBM ring buffers with explicit capacities.
    """

    grid_scale: float = 0.1
    keyframe_capacity: int = 512
    edge_capacity: int = 2048
    store_images: bool = True  # needed by the stitcher; disable to save HBM
    # Overflow policy when the bank is full (the reference grows unboundedly,
    # include/map.h:70-76): "ring" evicts the oldest non-base keyframe
    # (slot 0 — the pinned base — and the current tracking target are
    # spared) and disables edges/pending matches referencing the reused
    # slot; "drop" discards the new keyframe (r1 behavior, silently stops
    # map growth).
    eviction: str = "ring"
    # Cache per-keyframe correlation filters in the bank (2× spectra HBM).
    # Tracking always uses the cached filter of the current target (carried
    # in TrackState, no bank cost); this flag only affects loop-closure
    # candidates: off → the batched search recomputes Kzz per candidate
    # (+2 transforms each), halving bank memory.
    cache_filters: bool = True
    # Storage dtype of the bank's four spectral tensors (fft, polar_fft,
    # filt, filt_polar): "f32" or "bf16".  bf16 halves bank HBM *and* the
    # candidate-gather bandwidth; values upcast to f32 at the point of use
    # (ops.fft.r2c), so all COMPUTE stays full-precision — unlike the
    # rejected bf16 matmul-DFT operands (docs/PROFILE_r3.md §3), this is a
    # one-time rounding of stored values, and it only touches loop-closure
    # candidates (tracking reads the f32 TrackState carries, never the
    # bank).  f16 would overflow: the DC bin of a 640×480 [0,1] image
    # spectrum is ~1.5e5 > f16 max.
    bank_dtype: str = "f32"


@dataclasses.dataclass(frozen=True)
class LoopClosureConfig:
    """/root/reference/include/read_configs.h:38-44 plus candidate cap.

    ``max_candidates`` bounds the batched re-registration fan-out per
    keyframe (the reference evaluates every frame in the 3×3 grid
    neighborhood; the TPU build evaluates up to ``max_candidates`` of them
    in one vmapped batch).
    """

    to_find_loop: bool = True
    position_response_thr: float = 60.0
    angle_response_thr: float = 60.0
    frame_gap_thr: int = 100
    distance_thr: float = 5.0
    max_candidates: int = 8
    # Per-shard candidate cap of the SHARDED search (parallel.loop_search).
    # 0 (default) derives ceil(max_candidates / n_shards), so the sharded
    # search's total candidate budget matches the single-chip engine's
    # ``max_candidates`` — one meaning per knob across engines (VERDICT r4
    # weak #8).  Set explicitly to give every shard its own budget (the
    # r4 behavior was an implicit per-shard max_candidates).
    max_candidates_per_shard: int = 0
    pending_capacity: int = 32
    # Coarse-to-fine candidate selection (r5, for large images): rank the
    # candidate batch with a translation registration at 1/coarse_scale
    # resolution (consistent sinc downsampling of both sides via
    # ops.fft.spectral_crop), then run the EXACT full-resolution
    # two-hypothesis registration only on the winning candidate — the
    # acceptance thresholds and the loop-edge pose keep reference
    # semantics (loop_closure.cc:60-71); only the argmax over candidates
    # uses coarse confidences.  1 = off (rank at full resolution, the
    # reference behavior).  Must divide the image into even sizes.
    coarse_scale: int = 1


@dataclasses.dataclass(frozen=True)
class MapStitcherConfig:
    """/root/reference/include/read_configs.h:46-49 plus canvas bounds.

    The reference tiles an infinite plane into hash-keyed ``cell_size²``
    chunks; the TPU build rasterizes into one bounded dense canvas of
    ``canvas_size × canvas_size`` image-plane pixels centered on the
    trajectory origin (static shape for XLA; size it to the deployment
    area).  ``cell_size`` is kept for config parity.
    """

    stitch_map: bool = True
    cell_size: int = 1000
    canvas_size: int = 2048
    # Image-plane pixel the canvas is centered on (default: the trajectory
    # origin).  Point it at the deployment area's centroid when the path is
    # one-sided from its start — a centered canvas then needs only
    # extent+margin instead of 2×max-offset.
    canvas_center: tuple = (0, 0)
    # Stitch DURING the run, like the reference (InsertFrame per keyframe,
    # map_builder.cc:62; RecomputeOccupancy after every optimize, :113):
    # the canvas lives in the engine state and every keyframe pays one
    # H·W scatter-add.  Off (default): the mosaic is rasterized on demand
    # from the stored keyframe images (CLI --stitch / FullSlam.stitch) —
    # same pixels whenever poses are final, none of the per-frame cost.
    # Requires MapConfig.store_images.
    online: bool = False


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Pose-graph solver knobs — the TPU analogue of the Ceres options at
    /root/reference/src/optimization_2d/pose_graph_2d.cc:186-200 (LM over
    sparse Cholesky, ≤300 iterations).

    ``with_scale`` enables the joint metric-scale estimation variant
    (``PoseGraph2dErrorTermWithScale``) that the reference wires up but
    leaves disabled (/root/reference/src/map_builder.cc:256-257); the scale
    is free iff the camera height is flagged inaccurate.

    ``inline`` compiles the LM solve *into* the per-frame program (exact
    reference trigger timing, map_builder.cc:108-116 — but the dense
    ``(3K)²`` factorization then bloats the hot program's compile).  The
    default defers solves to a separately-jitted program invoked between
    scan chunks by the sequence driver: the reference solves rarely (≥2
    pending matches), so chunk-boundary solving is semantics-preserving up
    to trigger timing; single pending matches are kept rather than
    discarded (deviation from map_builder.cc:114-115's clear-on-<2).
    """

    max_iterations: int = 100
    with_scale: bool = False
    inline: bool = False


@dataclasses.dataclass(frozen=True)
class SavingConfig:
    """/root/reference/include/read_configs.h:59-62."""

    saving_root: str = "./saving"
    save_pose: bool = True


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Camera calibration — /root/reference/src/camera.cc:20-75.

    ``intrinsics = (fx, cx, fy, cy)``; ``distortion = (k1, k2, p1, p2, k3)``;
    ``extrinsics`` is the row-major 3×3 applied to metric ``(x, y, θ)``
    vectors; ``height`` is the camera height above ground (metric scale).
    """

    image_width: int = 640
    image_height: int = 480
    height: float = 1.0
    accurate_height: bool = True
    intrinsics: Tuple[float, float, float, float] = (500.0, 320.0, 500.0, 240.0)
    distortion: Tuple[float, float, float, float, float] = (0.0, 0.0, 0.0, 0.0, 0.0)
    extrinsics: Tuple[float, ...] = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    """Top-level config bundle — parity with ``Configs``
    (/root/reference/include/read_configs.h:64-133).

    (r2's speculative block-tracking mode — ``lookahead`` — was removed in
    r3: with the matmul-DFT front end per-frame tracking is both faster
    and exact, and block mode's stale-keyframe deviation broke rotating
    paths; measured in docs/PROFILE_r2.md §3.)
    """

    dataset: DatasetConfig = DatasetConfig()
    cf: CFConfig = CFConfig()
    keyframe_selection: KeyframeSelectionConfig = KeyframeSelectionConfig()
    map: MapConfig = MapConfig()
    loop_closure: LoopClosureConfig = LoopClosureConfig()
    map_stitcher: MapStitcherConfig = MapStitcherConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    saving: SavingConfig = SavingConfig()
    camera: CameraConfig = CameraConfig()
    # lax.scan unroll factor for the per-frame chunk drivers.  Measured
    # on the bench TPU (r5, NISLAM_BENCH_UNROLL): unroll=4 LOSES at both
    # the flagship (803→763 fps) and HD (147→80) configs — the engine's
    # while carries alias in place, so unrolling only bloats the program
    # and defeats buffer reuse.  Keep 1 unless profiling another backend
    # shows a per-while-iteration overhead (trivial-body probes on the
    # tunneled device do show one — scripts/bwprobe3.py — but the real
    # engine does not).
    scan_unroll: int = 1


def derive_response_thresholds(
    width: int,
    height: int,
    rotation_divisor: int,
    rotation_channel: int,
) -> dict:
    """Derive PSR thresholds for a problem size from the reference's anchors.

    The reference's tuning notes say the response thresholds scale with the
    problem size ("position_response_thr … should be tuned together with
    width and height: higher width*height -> higher threshold";
    "angle_response_thr … tuned together with rotation_divisor and
    rotation_channel", /root/reference/configs/config_geekplus.yaml:31-32)
    but give no law.  Measured on the synthetic workload
    (scripts/psrcal.py): median tracked-frame translation PSR follows
    (W*H)**0.48 ≈ sqrt(W*H) over 96²–384², so thresholds scale as
    sqrt(area).  Anchors are the reference's 640×480 / 720×480 values
    (config_ntu.yaml:19-32): lower/upper tracking 30/90, loop 60/60.

    Returns a dict with ``lower_response_thr``, ``upper_response_thr``
    (translation PSR, scaled by sqrt(W*H)),
    ``lower_rotation_response_thr``, ``upper_rotation_response_thr``
    (the keyframe band applied to the rotation PSR — scaled by
    sqrt(divisor*channel) since rotation PSR follows the polar grid, not
    the image) and ``position_response_thr``, ``angle_response_thr``
    (loop gates, scaled the same two ways).
    """
    s_img = (width * height) ** 0.5 / (640 * 480) ** 0.5
    s_rot = (rotation_divisor * rotation_channel) ** 0.5 / (720 * 480) ** 0.5
    return {
        "lower_response_thr": round(30.0 * s_img, 2),
        "upper_response_thr": round(90.0 * s_img, 2),
        "lower_rotation_response_thr": round(30.0 * s_rot, 2),
        "upper_rotation_response_thr": round(90.0 * s_rot, 2),
        "position_response_thr": round(60.0 * s_img, 2),
        "angle_response_thr": round(60.0 * s_rot, 2),
    }


def _validated(value: str, allowed: tuple, key: str) -> str:
    if value not in allowed:
        raise ValueError(f"{key}: {value!r} not in {allowed}")
    return value


def load_camera_config(path: str) -> CameraConfig:
    """Load the camera YAML (schema of /root/reference/src/camera.cc:20-75)."""
    with open(path) as f:
        node = yaml.safe_load(f)
    k = node["intrinsics"]["data"]
    d = node["distortion"]["data"]
    e = node["extrinsics"]["data"]
    return CameraConfig(
        image_width=int(node["image_size"][0]),
        image_height=int(node["image_size"][1]),
        height=float(node["height"]),
        accurate_height=bool(node["accurate_height"]),
        intrinsics=(float(k[0]), float(k[1]), float(k[2]), float(k[3])),
        distortion=tuple(float(x) for x in d[:5]),
        extrinsics=tuple(float(x) for x in e[:9]),
    )


def load_config(path: str, *, load_camera: bool = True) -> SlamConfig:
    """Load the main YAML (schema of /root/reference/include/read_configs.h:74-132).

    Unknown keys are ignored; TPU-only fields (capacities, candidate caps)
    may be given under the same blocks and override the defaults.
    """
    with open(path) as f:
        node = yaml.safe_load(f)

    ds = node.get("dataset", {})
    dataset = DatasetConfig(
        dataroot=ds.get("dataroot", ""),
        image_dir_name=ds.get("image_dir_name", ""),
        camera_file=ds.get("camera_config", ""),
    )

    cfn = node.get("correlation_flow", {})
    cf = CFConfig(
        width=int(cfn.get("width", 640)),
        height=int(cfn.get("height", 480)),
        lambda_=float(cfn.get("lambda", 0.1)),
        kernel=int(cfn.get("kernel", 0)),
        sigma=float(cfn.get("gaussian", {}).get("sigma", 0.2)),
        offset=float(cfn.get("polynomial", {}).get("offset", 0.1)),
        power=int(cfn.get("polynomial", {}).get("power", 3)),
        rotation_divisor=int(cfn.get("rotation_divisor", 720)),
        rotation_channel=int(cfn.get("rotation_channel", 480)),
        rotate_method=str(cfn.get("rotate_method", "fft")),
        polar_taps=_validated(
            str(cfn.get("polar_taps", "auto")), ("auto", "quad", "4tap"),
            "correlation_flow.polar_taps",
        ),
        half_polar=bool(cfn.get("half_polar", True)),
    )

    kfn = node.get("keyframe_selection", {})
    _lr = kfn.get("lower_rotation_response_thr")
    _ur = kfn.get("upper_rotation_response_thr")
    kfs = KeyframeSelectionConfig(
        max_distance=float(kfn.get("max_distance", 0.4)),
        max_angle=float(kfn.get("max_angle", 0.052359877)),
        lower_response_thr=float(kfn.get("lower_response_thr", 30.0)),
        upper_response_thr=float(kfn.get("upper_response_thr", 90.0)),
        lower_rotation_response_thr=None if _lr is None else float(_lr),
        upper_rotation_response_thr=None if _ur is None else float(_ur),
    )

    mpn = node.get("map", {})
    mp = MapConfig(
        grid_scale=float(mpn.get("grid_scale", 0.1)),
        keyframe_capacity=int(mpn.get("keyframe_capacity", 512)),
        edge_capacity=int(mpn.get("edge_capacity", 2048)),
        store_images=bool(mpn.get("store_images", True)),
        cache_filters=bool(mpn.get("cache_filters", True)),
        eviction=str(mpn.get("eviction", "ring")),
        bank_dtype=str(mpn.get("bank_dtype", "f32")),
    )

    lcn = node.get("loop_closure", {})
    lc = LoopClosureConfig(
        to_find_loop=bool(lcn.get("to_find_loop", True)),
        position_response_thr=float(lcn.get("position_response_thr", 60.0)),
        angle_response_thr=float(lcn.get("angle_response_thr", 60.0)),
        frame_gap_thr=int(lcn.get("frame_gap_thr", 100)),
        distance_thr=float(lcn.get("distance_thr", 5.0)),
        max_candidates=int(lcn.get("max_candidates", 8)),
        coarse_scale=int(lcn.get("coarse_scale", 1)),
        max_candidates_per_shard=int(lcn.get("max_candidates_per_shard", 0)),
        pending_capacity=int(lcn.get("pending_capacity", 32)),
    )

    # Note the reference's YAML key is (sic) "map_sticther"
    # (/root/reference/include/read_configs.h:118); accept both spellings.
    msn = node.get("map_sticther", node.get("map_stitcher", {}))
    ms = MapStitcherConfig(
        stitch_map=bool(msn.get("stitch_map", True)),
        cell_size=int(msn.get("cell_size", 1000)),
        canvas_size=int(msn.get("canvas_size", 2048)),
        canvas_center=tuple(
            int(v) for v in msn.get("canvas_center", (0, 0))
        ),
        online=bool(msn.get("online", False)),
    )

    opn = node.get("optimizer", {})
    opt = OptimizerConfig(
        max_iterations=int(opn.get("max_iterations", 100)),
        with_scale=bool(opn.get("with_scale", False)),
        inline=bool(opn.get("inline", False)),
    )

    svn = node.get("saving", {})
    sv = SavingConfig(
        saving_root=svn.get("saving_root", "./saving"),
        save_pose=bool(svn.get("save_pose", True)),
    )

    camera = CameraConfig(image_width=cf.width, image_height=cf.height)
    if load_camera and dataset.camera_file:
        camera = load_camera_config(dataset.camera_file)

    return SlamConfig(
        dataset=dataset,
        cf=cf,
        keyframe_selection=kfs,
        map=mp,
        loop_closure=lc,
        map_stitcher=ms,
        optimizer=opt,
        saving=sv,
        camera=camera,
        scan_unroll=int(node.get("scan_unroll", 1)),
    )
