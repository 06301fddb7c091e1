"""Native C++ loader tests (skipped when no toolchain builds the .so)."""

import numpy as np
import pytest

from nislam_tpu.io.dataset import SyntheticDataset

native = pytest.importorskip("nislam_tpu.io.native_loader")

pytestmark = pytest.mark.skipif(
    not native.NativeChunkReader.available(), reason="libnisf_loader.so unavailable"
)


@pytest.fixture
def packed(tmp_path, rng):
    frames = rng.random((23, 16, 20)).astype(np.float32)
    ds = SyntheticDataset(frames, rate_hz=10.0)
    p = str(tmp_path / "f.nisf")
    ds.pack(p)
    return p, frames


def test_roundtrip_chunks(packed):
    p, frames = packed
    r = native.NativeChunkReader(p, chunk=5, threads=3, ring=3)
    assert (r.n, r.height, r.width) == (23, 16, 20)
    got, times = [], []
    for f, t in r:
        got.append(f)
        times.append(t)
    got = np.concatenate(got)
    assert [len(t) for t in times] == [5, 5, 5, 5, 3]
    np.testing.assert_array_equal(got, frames)
    np.testing.assert_allclose(np.concatenate(times), np.arange(23) / 10.0)
    r.close()


def test_zero_copy_frame_and_timestamps(packed):
    p, frames = packed
    r = native.NativeChunkReader(p, chunk=8, threads=1, ring=2)
    np.testing.assert_array_equal(r.frame(7), frames[7])
    with pytest.raises(IndexError):
        r.frame(99)
    np.testing.assert_allclose(r.timestamps(), np.arange(23) / 10.0)
    r.close()


def test_missing_file(tmp_path):
    with pytest.raises(FileNotFoundError):
        native.NativeChunkReader(str(tmp_path / "nope.nisf"), chunk=4)


def test_chunk_larger_than_dataset(packed):
    p, frames = packed
    r = native.NativeChunkReader(p, chunk=64, threads=2, ring=2)
    chunks = list(r)
    assert len(chunks) == 1
    np.testing.assert_array_equal(chunks[0][0], frames)
    r.close()


class _U8Dataset(SyntheticDataset):
    """8-bit source: get() normalizes, get_raw() serves uint8."""

    def __init__(self, u8_frames, rate_hz=10.0):
        super().__init__(u8_frames.astype(np.float32) / 255.0, rate_hz)
        self._u8 = u8_frames

    def get_raw(self, idx):
        return self._u8[idx], self.t0 + idx / self.rate


def test_v2_u8_roundtrip(tmp_path, rng):
    """An 8-bit source packs as NISF v2 (uint8 frames, 4x smaller) and
    reads back bit-exactly in uint8."""
    u8 = (rng.random((11, 16, 20)) * 255).astype(np.uint8)
    ds = _U8Dataset(u8)
    p = str(tmp_path / "u8.nisf")
    ds.pack(p)
    import os

    assert os.path.getsize(p) == 20 + 11 * 8 + 11 * 16 * 20 * 1  # v2: 1 B/px
    r = native.NativeChunkReader(p, chunk=4, threads=2, ring=2)
    assert r.dtype == np.uint8
    got = np.concatenate([f for f, _ in r])
    np.testing.assert_array_equal(got, u8)
    np.testing.assert_array_equal(r.frame(3), u8[3])
    r.close()


def test_v1_f32_file_size(packed):
    import os

    p, frames = packed
    assert os.path.getsize(p) == 20 + 23 * 8 + 23 * 16 * 20 * 4  # v1: f32


def test_u8_engine_input_matches_f32(rng):
    """frontend(uint8) == frontend(f32/255) bit-exactly — the on-device
    normalization is the same `astype(f32)/255` as the host path."""
    import jax.numpy as jnp

    from nislam_tpu.core.camera import make_camera_ops
    from nislam_tpu.core.config import CameraConfig, CFConfig
    from nislam_tpu.core.slam import frontend
    from nislam_tpu.ops.registration import make_cf_ops

    h, w = 48, 64
    cfg = CFConfig(width=w, height=h, rotation_divisor=90, rotation_channel=48)
    cam = make_camera_ops(CameraConfig(
        image_width=w, image_height=h, height=1.0,
        intrinsics=(float(w), w / 2.0, float(w), h / 2.0),
    ))
    ops = make_cf_ops(cfg)
    u8 = (rng.random((2, h, w)) * 255).astype(np.uint8)
    a = frontend(jnp.asarray(u8), cf_ops=ops, camera=cam)
    b = frontend(
        jnp.asarray(u8.astype(np.float32) / 255.0), cf_ops=ops, camera=cam
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
