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
