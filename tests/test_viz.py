"""Visualization + homography pipeline tests."""

import numpy as np
import pytest

from tapnet_tpu.utils import viz


class TestPaintPointTrack:

  def test_paints_visible_points(self):
    frames = np.zeros((2, 64, 64, 3), np.uint8)
    tracks = np.array([[[32.0, 32.0], [40.0, 20.0]]])  # [1, 2, 2]
    visibles = np.array([[True, False]])
    out = viz.paint_point_track(
        frames, tracks, visibles, colormap=[(255, 0, 0)]
    )
    assert out.shape == frames.shape
    assert out[0, 32, 32, 0] > 200  # red dot on frame 0
    assert out[1].sum() == 0  # occluded on frame 1: untouched

  def test_out_of_bounds_safe(self):
    frames = np.zeros((1, 32, 32, 3), np.uint8)
    tracks = np.array([[[-50.0, 200.0]]])
    visibles = np.array([[True]])
    out = viz.paint_point_track(frames, tracks, visibles)
    assert out.shape == frames.shape


class TestPlots:

  def test_plot_tracks_shapes(self):
    rgb = (np.random.rand(2, 64, 64, 3) * 255).astype(np.uint8)
    pts = np.random.rand(5, 2, 2) * 64
    occ = np.zeros((5, 2), bool)
    out = viz.plot_tracks(rgb, pts, occ)
    assert out.shape == (2, 64, 64, 3)
    assert out.dtype == np.uint8

  def test_plot_tracks_grid(self):
    rgb = (np.random.rand(1, 32, 32, 3) * 255).astype(np.uint8)
    pts = np.random.rand(8, 1, 2) * 32
    occ = np.zeros((8, 1), bool)
    out = viz.plot_tracks_grid(rgb, pts, occ)
    assert out.shape == (1, 64, 64, 3)

  def test_write_video(self, tmp_path):
    frames = (np.random.rand(3, 32, 32, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "out.mp4")
    viz.write_video(path, frames)
    import os

    assert os.path.getsize(path) > 0


def random_homography(rng, scale=0.1):
  h = np.eye(3) + rng.randn(3, 3) * scale
  h[2, 2] = 1.0
  return h


class TestHomography:

  def test_estimate_exact(self):
    rng = np.random.RandomState(0)
    h_true = random_homography(rng, 0.05)
    src = rng.rand(20, 2) * 2 - 1
    targ = np.asarray(viz.apply_homography(h_true, src))
    h_est = np.asarray(viz.estimate_homography(targ, src))
    h_est = h_est / h_est[2, 2] * h_true[2, 2]
    # Homographies are scale-equivalent; compare action on points.
    targ_est = np.asarray(viz.apply_homography(h_est, src))
    np.testing.assert_allclose(targ_est, targ, atol=1e-4)

  def test_ransac_rejects_outliers(self):
    rng = np.random.RandomState(1)
    h_true = random_homography(rng, 0.03)
    src = rng.rand(60, 2) * 2 - 1
    targ = np.asarray(viz.apply_homography(h_true, src))
    # Corrupt 30% of correspondences.
    bad = rng.rand(60) < 0.3
    targ_noisy = targ.copy()
    targ_noisy[bad] += rng.rand(bad.sum(), 2) * 5 + 1.0
    vis = np.ones(60)
    h_est, inliers = viz.ransac_homography(
        targ_noisy, src, vis, thresh=0.05
    )
    inliers = np.asarray(inliers)
    assert inliers[~bad].mean() > 0.9  # clean points recognized
    assert inliers[bad].mean() < 0.2  # corrupted points rejected

  def test_get_homographies_static_camera_pan(self):
    """Synthetic panning camera over a plane: recovered homographies should
    map points between frames correctly."""
    rng = np.random.RandomState(2)
    n, t = 40, 5
    world = rng.rand(n, 2) * 100 + 50
    pts = np.zeros((n, t, 2))
    for fr in range(t):
      shift = np.array([fr * 5.0, fr * 2.0])
      pts[:, fr] = world + shift
    occ = np.zeros((n, t))

    homogs, err, canonical = viz.get_homographies_wrt_frame(
        pts, occ, image_dimensions=(256, 256), num_refinement_passes=1
    )
    assert homogs.shape == (t, 3, 3)
    # Map frame 0 points into frame 3 and compare.
    m = np.linalg.inv(homogs[3]) @ homogs[0]
    mapped = np.asarray(viz.apply_homography(m, pts[:, 0]))
    np.testing.assert_allclose(mapped, pts[:, 3], atol=0.5)
    assert err.shape == (n, t)

  def test_plot_tracks_tails(self):
    rgb = (np.random.rand(3, 48, 48, 3) * 255).astype(np.uint8)
    pts = np.random.rand(4, 3, 2) * 48
    occ = np.zeros((4, 3))
    homogs = np.stack([np.eye(3)] * 3)
    out = viz.plot_tracks_tails(rgb, pts, occ, homogs)
    assert out.shape == (3, 48, 48, 3)


class TestGetColors:

  def test_count_range_distinct(self):
    colors = viz.get_colors(24)
    assert len(colors) == 24
    arr = np.array(colors)
    assert arr.shape == (24, 3)
    assert arr.min() >= 0 and arr.max() <= 255
    # Evenly-spaced hues at fixed S/V are all distinct.
    assert len({tuple(c) for c in colors}) == 24

  def test_seed_deterministic(self):
    assert viz.get_colors(16, seed=7) == viz.get_colors(16, seed=7)

  def test_single_color(self):
    (c,) = viz.get_colors(1)
    assert len(c) == 3


def test_paint_tiny_frames():
  # Frames < ~34 px used to yield radius 0 -> NaN icon -> black output.
  frames = np.zeros((1, 32, 32, 3), np.uint8)
  tracks = np.array([[[16.0, 16.0]]])
  out = viz.paint_point_track(
      frames, tracks, np.ones((1, 1), bool), [(255, 0, 0)]
  )
  assert out.max() > 100
