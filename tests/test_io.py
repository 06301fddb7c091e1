"""IO-layer tests: datasets, trajectory formats, ATE, checkpoints, CLI."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from nislam_tpu.io.dataset import (
    ImageFolderDataset,
    SyntheticDataset,
    TumRgbdDataset,
    open_dataset,
)
from nislam_tpu.io.trajectory import (
    associate,
    ate_rmse,
    read_tum,
    umeyama_2d,
    write_tum,
)


def _write_png(path, arr):
    import cv2

    cv2.imwrite(str(path), arr)


@pytest.fixture
def ref_layout(tmp_path, rng):
    """Reference dataset layout (README.md:142-153)."""
    d = tmp_path / "ds"
    (d / "rgb").mkdir(parents=True)
    names = []
    for i in range(5):
        img = (rng.random((8, 12)) * 255).astype(np.uint8)
        name = f"{i:05d}.png"
        _write_png(d / "rgb" / name, img)
        names.append(name)
    (d / "image_names.txt").write_text("\n".join(names) + "\n")
    (d / "times.txt").write_text("\n".join(f"{i * 0.1:.6f}" for i in range(5)) + "\n")
    return str(d)


def test_image_folder_dataset(ref_layout):
    ds = ImageFolderDataset(ref_layout)
    assert len(ds) == 5
    img, t = ds.get(2)
    assert img.shape == (8, 12) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert t == pytest.approx(0.2)
    # auto-detection
    assert isinstance(open_dataset(ref_layout), ImageFolderDataset)


def test_missing_times_gives_minus_one(tmp_path, rng):
    d = tmp_path / "ds2"
    (d / "rgb").mkdir(parents=True)
    _write_png(d / "rgb" / "a.png", (rng.random((4, 4)) * 255).astype(np.uint8))
    (d / "image_names.txt").write_text("a.png\n")
    ds = ImageFolderDataset(str(d))
    assert ds.get(0)[1] == -1.0  # dataset.cc:47-53 semantics


def test_tum_layout(tmp_path, rng):
    d = tmp_path / "tum"
    (d / "rgb").mkdir(parents=True)
    lines = ["# comment"]
    for i in range(3):
        img = (rng.random((6, 6)) * 255).astype(np.uint8)
        _write_png(d / "rgb" / f"{i}.png", img)
        lines.append(f"{1300000000.5 + i} rgb/{i}.png")
    (d / "rgb.txt").write_text("\n".join(lines) + "\n")
    ds = open_dataset(str(d))
    assert isinstance(ds, TumRgbdDataset)
    assert len(ds) == 3
    _, t = ds.get(1)
    assert t == pytest.approx(1300000001.5)


def test_chunks(rng):
    frames = rng.random((7, 4, 4)).astype(np.float32)
    ds = SyntheticDataset(frames, rate_hz=10.0)
    chunks = list(ds.chunks(3))
    assert [len(c[0]) for c in chunks] == [3, 3, 1]
    np.testing.assert_allclose(chunks[1][1], [0.3, 0.4, 0.5])


def test_pack_roundtrip(tmp_path, rng):
    import struct

    frames = rng.random((3, 4, 6)).astype(np.float32)
    ds = SyntheticDataset(frames, rate_hz=10.0)
    p = str(tmp_path / "frames.nisf")
    ds.pack(p)
    with open(p, "rb") as f:
        magic, ver, n, h, w = struct.unpack("<4sIIII", f.read(20))
        assert (magic, ver, n, h, w) == (b"NISF", 1, 3, 4, 6)
        times = np.frombuffer(f.read(8 * n), "<f8")
        np.testing.assert_allclose(times, [0.0, 0.1, 0.2])
        data = np.frombuffer(f.read(), "<f4").reshape(3, 4, 6)
        np.testing.assert_array_equal(data, frames)


# ---------------------------------------------------------------------------
# Trajectories
# ---------------------------------------------------------------------------


def test_tum_roundtrip(tmp_path):
    times = np.array([0.0, 0.5, 1.0])
    poses = np.array([[0, 0, 0], [1.0, 2.0, 0.3], [-1.0, 0.5, -2.8]])
    p = str(tmp_path / "traj.txt")
    write_tum(p, times, poses)
    t2, p2 = read_tum(p)
    np.testing.assert_allclose(t2, times, atol=1e-6)
    np.testing.assert_allclose(p2, poses, atol=1e-5)


def test_associate():
    a = np.array([0.0, 1.0, 2.0])
    b = np.array([0.005, 1.5, 1.994])
    ia, ib = associate(a, b, max_dt=0.02)
    np.testing.assert_array_equal(ia, [0, 2])
    np.testing.assert_array_equal(ib, [0, 2])


def test_umeyama_recovers_rigid_transform(rng):
    src = rng.random((20, 2))
    th = 0.7
    r_true = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    t_true = np.array([3.0, -1.0])
    dst = (r_true @ src.T).T + t_true
    r, t, s = umeyama_2d(src, dst)
    np.testing.assert_allclose(r, r_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)
    assert s == 1.0


def test_ate_rmse_zero_for_aligned(rng):
    times = np.arange(10.0)
    xy = rng.random((10, 2))
    th = -0.4
    r = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    moved = (r @ xy.T).T + [5.0, 2.0]
    assert ate_rmse(times, moved, times, xy) < 1e-9
    assert ate_rmse(times, xy + [0.1, 0.0], times, xy, align=False) == pytest.approx(0.1)


# ---------------------------------------------------------------------------
# Checkpoint
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path):
    from nislam_tpu.core.config import CFConfig, MapConfig, SlamConfig
    from nislam_tpu.core.slam import make_engine
    from nislam_tpu.io.checkpoint import load_state, save_state

    cfg = SlamConfig(
        cf=CFConfig(width=32, height=24, rotation_divisor=36, rotation_channel=16),
        map=MapConfig(keyframe_capacity=4, edge_capacity=8),
    )
    engine = make_engine(cfg)
    state = engine.init_state()
    state, _ = engine.step(state, jnp.ones((24, 32), jnp.float32) * 0.5)
    p = str(tmp_path / "state.npz")
    save_state(p, state)
    restored = load_state(p, engine.init_state())
    assert int(restored.bank.count) == 1
    np.testing.assert_allclose(
        np.asarray(restored.track.last_fft), np.asarray(state.track.last_fft)
    )

    # bf16 bank checkpoints roundtrip bit-exactly (npz has no bfloat16;
    # save_state stores the bit pattern — io/checkpoint.py)
    import dataclasses

    cfgb = dataclasses.replace(
        cfg, map=dataclasses.replace(cfg.map, bank_dtype="bf16")
    )
    engb = make_engine(cfgb)
    stb = engb.init_state()
    stb, _ = engb.step(stb, jnp.ones((24, 32), jnp.float32) * 0.5)
    pb = str(tmp_path / "state_bf16.npz")
    save_state(pb, stb)
    restb = load_state(pb, engb.init_state())
    assert restb.bank.fft.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restb.bank.fft, dtype=np.float32),
        np.asarray(stb.bank.fft, dtype=np.float32),
    )

    # structure mismatch → clear error
    cfg2 = SlamConfig(
        cf=CFConfig(width=32, height=24, rotation_divisor=36, rotation_channel=16),
        map=MapConfig(keyframe_capacity=8, edge_capacity=8),
    )
    with pytest.raises(ValueError, match="shape"):
        load_state(p, make_engine(cfg2).init_state())


# ---------------------------------------------------------------------------
# CLI end-to-end (subprocess — the real user surface)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = str(tmp_path / "ds")
    r = subprocess.run(
        [sys.executable, "-m", "nislam_tpu", "synth", "--out", ds,
         "--frames", "60", "--height", "96", "--width", "128"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "nislam_tpu", "run",
         "--config", f"{ds}/config.yaml",
         "--groundtruth", f"{ds}/groundtruth.txt",
         "--save-state", f"{ds}/state.npz"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "ATE RMSE" in r.stdout
    ate = float(r.stdout.split("ATE RMSE (optimized keyframes):")[1].split("m")[0])
    assert ate < 0.05
    assert os.path.exists(f"{ds}/saving/KCC_Keyframe.txt")
    assert os.path.exists(f"{ds}/saving/optimized_keyframe.txt")
    assert os.path.exists(f"{ds}/state.npz")
    t, poses = read_tum(f"{ds}/saving/optimized_keyframe.txt")
    assert len(t) > 5 and poses.shape[1] == 3


def test_cli_end_to_end_rotating_noisy(tmp_path):
    """The synth generator's rotating (tangent-heading) path with sensor
    noise tracks end-to-end through the CLI — the non-trivial counterpart
    of the exact integer-pixel square path."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = str(tmp_path / "dsl")
    r = subprocess.run(
        [sys.executable, "-m", "nislam_tpu", "synth", "--out", ds,
         "--frames", "80", "--height", "96", "--width", "128",
         "--path", "loop", "--noise"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "nislam_tpu", "run",
         "--config", f"{ds}/config.yaml",
         "--groundtruth", f"{ds}/groundtruth.txt"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    ate = float(r.stdout.split("ATE RMSE (optimized keyframes):")[1].split("m")[0])
    # Rotation + noise: interpolation-limited, not exact; still tight.
    assert 0.0 < ate < 0.08, r.stdout


@pytest.mark.slow
def test_cli_optimizes_mid_run(tmp_path):
    """A loop-closing sequence must trigger pose-graph solves DURING the run
    (CheckAndOptimize parity, map_builder.cc:108-116 / main.cpp:68-69), not
    only at finalize — VERDICT r2 weak #5."""
    from nislam_tpu.cli import main as cli_main
    from nislam_tpu.io.synth_dataset import generate_synthetic_dataset

    ds = str(tmp_path / "ds")
    generate_synthetic_dataset(ds, n_frames=60, height=96, width=128, path_kind="square")

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli_main([
            "run", "--config", f"{ds}/config.yaml", "--chunk", "12",
        ])
    out = buf.getvalue()
    assert rc == 0
    assert "mid-run pose-graph solves:" in out
    solves = int(out.split("mid-run pose-graph solves:")[1].split()[0])
    assert solves >= 1, out


def test_shipped_configs_load():
    """Every YAML under configs/ parses into a coherent SlamConfig with the
    reference's field values (VERDICT r1 task 9)."""
    import os

    from nislam_tpu.core.config import load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    cfgs = {}
    for name in sorted(os.listdir(root)):
        if name.endswith(".yaml"):
            cfgs[name] = load_config(os.path.join(root, name), load_camera=False)
    assert {"config_ntu.yaml", "config_HD.yaml", "config_geekplus.yaml",
            "config_tum.yaml"} <= set(cfgs)
    ntu = cfgs["config_ntu.yaml"]
    assert (ntu.cf.width, ntu.cf.height) == (640, 480)
    assert (ntu.cf.rotation_divisor, ntu.cf.rotation_channel) == (720, 480)
    assert ntu.keyframe_selection.max_distance == 0.4
    hd = cfgs["config_HD.yaml"]
    assert (hd.cf.width, hd.cf.height) == (1600, 1200)
    assert hd.keyframe_selection.max_distance == 0.01
    assert hd.keyframe_selection.max_angle == 6.3
    gp = cfgs["config_geekplus.yaml"]
    assert (gp.cf.width, gp.cf.height) == (448, 448)
    assert gp.keyframe_selection.upper_response_thr == 60
    for c in cfgs.values():
        assert c.cf.lambda_ == 0.1 and c.cf.kernel == 0
        assert c.map_stitcher.stitch_map


def test_derived_thresholds_anchor_and_scaling():
    """derive_response_thresholds reproduces the reference anchors at the
    reference problem size and follows the measured sqrt-area law
    (scripts/psrcal.py; reference tuning note config_geekplus.yaml:31-32)."""
    from nislam_tpu.core.config import derive_response_thresholds

    ref = derive_response_thresholds(640, 480, 720, 480)
    assert ref == {
        "lower_response_thr": 30.0,
        "upper_response_thr": 90.0,
        "lower_rotation_response_thr": 30.0,
        "upper_rotation_response_thr": 90.0,
        "position_response_thr": 60.0,
        "angle_response_thr": 60.0,
    }
    # Quarter the pixels in each dimension -> half the threshold.
    small = derive_response_thresholds(320, 240, 720, 480)
    assert abs(small["lower_response_thr"] - 15.0) < 0.01
    assert abs(small["position_response_thr"] - 30.0) < 0.01
    # Rotation gates scale with the polar grid only.
    assert small["angle_response_thr"] == 60.0
    rot = derive_response_thresholds(640, 480, 360, 240)
    assert abs(rot["angle_response_thr"] - 30.0) < 0.01
    assert abs(rot["lower_rotation_response_thr"] - 15.0) < 0.01
    assert abs(rot["upper_rotation_response_thr"] - 45.0) < 0.01
    assert rot["position_response_thr"] == 60.0
    assert rot["lower_response_thr"] == 30.0


def test_cli_eval_subcommand(tmp_path):
    """The eval subcommand (BASELINE-style model evaluation) emits one
    parseable JSON record per model with timestamp-associated ATE."""
    import json

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = str(tmp_path / "ds")
    r = subprocess.run(
        [sys.executable, "-m", "nislam_tpu", "synth", "--out", ds,
         "--frames", "48", "--height", "96", "--width", "128"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    for model in ("slam", "vo"):
        r = subprocess.run(
            [sys.executable, "-m", "nislam_tpu", "eval",
             "--config", f"{ds}/config.yaml",
             "--groundtruth", f"{ds}/groundtruth.txt",
             "--model", model, "--chunk", "24"],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stderr
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        assert rec["model"] == model
        assert rec["frames"] == 48
        assert rec["tracked_frac"] == 1.0
        assert rec["ate_rmse_m"] is not None and rec["ate_rmse_m"] < 0.05
        if model == "slam":
            assert "loops" in rec and "solves" in rec


def _nisf_vs_python_cli(tmp_path, n_frames, run_args):
    """Shared scaffold: synth a dataset, run the CLI with the Python
    reader and (after packing) the native NISF loader, assert
    byte-identical trajectory dumps.  Skips without the native lib."""
    from nislam_tpu.io.native_loader import NativeChunkReader

    if not NativeChunkReader.available():
        import pytest

        pytest.skip("native loader unavailable (no C++ toolchain)")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = str(tmp_path / "ds")
    r = subprocess.run(
        [sys.executable, "-m", "nislam_tpu", "synth", "--out", ds,
         "--frames", str(n_frames), "--height", "96", "--width", "128"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr

    def run(extra, tag):
        out = str(tmp_path / tag)
        r = subprocess.run(
            [sys.executable, "-m", "nislam_tpu", "run",
             "--config", f"{ds}/config.yaml", "--saving-root", out]
            + run_args + extra,
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stderr
        return out, r.stdout

    py_out, py_log = run(["--nisf", "off"], "py")
    assert "native loader" not in py_log
    r = subprocess.run(
        [sys.executable, "-m", "nislam_tpu", "pack", "--dataroot", ds,
         "--out", f"{ds}/frames.nisf"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    nf_out, nf_log = run([], "nisf")  # auto-detects frames.nisf
    assert "native loader" in nf_log
    for f in ("KCC_Keyframe.txt", "optimized_keyframe.txt"):
        with open(os.path.join(py_out, f)) as a, open(os.path.join(nf_out, f)) as b:
            assert a.read() == b.read(), f


def test_cli_nisf_stream_matches_python_reader(tmp_path):
    """`run` streaming through the native NISF prefetch loader produces
    byte-identical trajectory dumps to the Python dataset reader — with a
    chunk size that forces a masked tail through the shared streamed
    driver (VERDICT r4 weak #2/#3)."""
    _nisf_vs_python_cli(tmp_path, 50, ["--chunk", "16"])


def test_cli_step_mode_nisf_matches_python_reader(tmp_path):
    """Step mode through the zero-copy NISF frame accessor produces the
    same trajectory dumps as the Python per-frame reader."""
    _nisf_vs_python_cli(tmp_path, 24, ["--mode", "step"])


def test_cli_calibrate_subcommand(tmp_path, capsys):
    """`nislam_tpu calibrate` prints a parseable YAML snippet with sane
    margins on the gaussian-anchor synthetic dataset (texture ratio ≈ 1)."""
    from nislam_tpu.cli import main as cli_main

    ds = str(tmp_path / "ds")
    rc = cli_main([
        "synth", "--out", ds, "--frames", "16",
        "--height", "96", "--width", "128",
    ])
    assert rc == 0
    rc = cli_main(["calibrate", "--config", f"{ds}/config.yaml",
                   "--frames", "12"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "keyframe_selection:" in out and "loop_closure:" in out
    import yaml

    doc = yaml.safe_load(
        "\n".join(l for l in out.splitlines() if not l.startswith("#"))
    )
    for k in ("lower_response_thr", "upper_response_thr"):
        assert doc["keyframe_selection"][k] > 0
    assert doc["loop_closure"]["position_response_thr"] > 0
    # anchor-family sanity: ratio printed near 1
    ratio_line = [l for l in out.splitlines() if "texture ratio" in l][0]
    import re

    vals = [float(v) for v in re.findall(r"[0-9.]+", ratio_line)]
    assert all(0.6 <= v <= 1.6 for v in vals), ratio_line


def test_run_snapshotter_unit(tmp_path, rng):
    """RunSnapshotter emits numbered + latest artifacts from live state."""
    import jax.numpy as jnp

    from nislam_tpu.core.config import (
        CFConfig,
        CameraConfig,
        MapStitcherConfig,
        SlamConfig,
        MapConfig,
    )
    from nislam_tpu.core.slam import make_engine
    from nislam_tpu.io.visualization import RunSnapshotter
    from nislam_tpu.utils.synthetic import make_world, render_frame

    h, w = 96, 128
    cfg = SlamConfig(
        cf=CFConfig(width=w, height=h, rotation_divisor=90, rotation_channel=48),
        map=MapConfig(keyframe_capacity=8, edge_capacity=16, store_images=True),
        map_stitcher=MapStitcherConfig(canvas_size=512),
        camera=CameraConfig(
            image_width=w, image_height=h, height=1.0,
            intrinsics=(float(w), w / 2.0, float(w), h / 2.0),
        ),
    )
    eng = make_engine(cfg)
    st = eng.init_state()
    world = make_world(512, 3.0)
    outs = []
    from nislam_tpu.core.slam import unpack_step_output

    for i, (px, py) in enumerate([(256, 256), (260, 256), (265, 257)]):
        img = jnp.asarray(render_frame(world, h, w, float(px), float(py), 0.0))
        st, packed = eng.step_packed(st, img)
        outs.append(unpack_step_output(packed))
    snap = RunSnapshotter(str(tmp_path), eng, cfg)
    snap.emit(st, outs, 3)
    assert os.path.exists(str(tmp_path / "snapshots" / "trajectory_000003.png"))
    assert os.path.exists(str(tmp_path / "trajectory_latest.png"))
    assert os.path.exists(str(tmp_path / "snapshots" / "occupancy_000003.png"))
    assert os.path.exists(str(tmp_path / "occupancy_latest.png"))
