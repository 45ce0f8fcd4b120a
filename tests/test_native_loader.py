"""Native C++ video ingest: build, numerical parity with the numpy oracle,
multi-thread iteration, and error handling."""

import os

import numpy as np
import pytest

from tapnet_tpu.data import native_loader


@pytest.fixture(scope="module")
def video_files(tmp_path_factory):
  d = tmp_path_factory.mktemp("videos")
  rng = np.random.RandomState(0)
  paths = []
  for i, (t, h, w) in enumerate([(6, 40, 56), (3, 24, 24), (8, 31, 17)]):
    v = (rng.rand(t, h, w, 3) * 255).astype(np.uint8)
    p = str(d / f"vid_{i}.npy")
    np.save(p, v)
    paths.append(p)
  return paths


class TestNativeBuild:

  def test_library_builds(self):
    lib = native_loader.load_library()
    assert lib is not None, "g++ is available in this image; build must work"


class TestParity:

  def test_matches_numpy_oracle(self, video_files):
    loader = native_loader.NativeVideoLoader(
        video_files[:1], batch_size=1, num_frames=6, height=32, width=48,
        num_threads=2, shuffle=False,
    )
    assert loader.is_native
    batch = next(loader)
    assert batch.shape == (1, 6, 32, 48, 3)
    video = np.load(video_files[0])
    ref = native_loader.resize_normalize_reference(video, 32, 48)
    np.testing.assert_allclose(batch[0], ref, rtol=1e-5, atol=1e-5)
    loader.close()

  def test_short_clip_repeats_last_frame(self, video_files):
    # vid_1 has 3 frames; asking for 5 must repeat frame 2.
    loader = native_loader.NativeVideoLoader(
        video_files[1:2], batch_size=1, num_frames=5, height=16, width=16,
        num_threads=1, shuffle=False,
    )
    batch = next(loader)
    np.testing.assert_array_equal(batch[0, 2], batch[0, 3])
    np.testing.assert_array_equal(batch[0, 2], batch[0, 4])
    loader.close()

  def test_python_fallback_same_semantics(self, video_files):
    nat = native_loader.NativeVideoLoader(
        video_files, batch_size=3, num_frames=4, height=20, width=20,
        num_threads=1, shuffle=False,
    )
    py = native_loader.NativeVideoLoader(
        video_files, batch_size=3, num_frames=4, height=20, width=20,
        num_threads=0, shuffle=False,
    )
    assert nat.is_native and not py.is_native
    a, b = next(nat), next(py)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    nat.close()


class TestStreaming:

  def test_many_batches_multithreaded(self, video_files):
    loader = native_loader.NativeVideoLoader(
        video_files, batch_size=2, num_frames=4, height=24, width=24,
        num_threads=4, prefetch=3, shuffle=True,
    )
    for _ in range(10):
      batch = next(loader)
      assert batch.shape == (2, 4, 24, 24, 3)
      assert np.isfinite(batch).all()
      assert batch.min() >= -1.0 and batch.max() <= 1.0
    loader.close()

  def test_bad_file_reports_error(self, tmp_path):
    bad = str(tmp_path / "bad.npy")
    with open(bad, "wb") as f:
      f.write(b"not an npy")
    loader = native_loader.NativeVideoLoader(
        [bad], batch_size=1, num_frames=2, height=8, width=8,
        num_threads=1,
    )
    with pytest.raises(RuntimeError, match="npy"):
      next(loader)
    loader.close()

  def test_float_video_rejected(self, tmp_path):
    p = str(tmp_path / "f32.npy")
    np.save(p, np.zeros((2, 8, 8, 3), np.float32))
    loader = native_loader.NativeVideoLoader(
        [p], batch_size=1, num_frames=2, height=8, width=8, num_threads=1
    )
    with pytest.raises(RuntimeError):
      next(loader)
    loader.close()
