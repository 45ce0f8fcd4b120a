"""Tests for AJ_RD metric (with torch-reference parity) and augmentations."""

import jax
import os
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.data import augmentations
from tapnet_tpu.tapvid import aj_rd

try:
  import torch
  from tapnet.tapnextpp.metrics import aj_rd as ref_aj_rd

  HAS_REF = True
except Exception:
  HAS_REF = False

needs_ref = pytest.mark.skipif(not HAS_REF, reason="torch ref unavailable")


def random_case(seed=0, b=2, t=40, n=6):
  rng = np.random.RandomState(seed)
  gt_vis = rng.rand(b, t, n) > 0.4
  gt_tracks = rng.rand(b, t, n, 2) * 256
  pred_vis = rng.rand(b, t, n) > 0.4
  pred_tracks = gt_tracks + rng.randn(b, t, n, 2) * 3
  return pred_tracks, pred_vis, gt_tracks, gt_vis


class TestAJRD:

  def test_perfect_redetection(self):
    # One track: visible, gap of 3, visible again; perfect predictions.
    gt_vis = np.array([[1, 0, 0, 0, 1, 1]], bool).T[None]  # [1, 6, 1]
    gt_tracks = np.tile(
        np.arange(6)[None, :, None, None], (1, 1, 1, 2)
    ).astype(np.float64)
    out = aj_rd.compute_redetection_metrics(
        gt_tracks, gt_vis, gt_tracks, gt_vis
    )
    assert out["AJ_RD_dmin1"] == 1.0
    assert np.isnan(out["AJ_RD_dmin16"])  # no long gaps

  def test_consecutive_invisibility(self):
    vis = np.array([[1, 0, 0, 1, 0, 1]], bool).T[None]
    d = aj_rd.consecutive_invisibility(vis)
    np.testing.assert_array_equal(d[0, :, 0], [0, 0, 1, 2, 0, 1])

  @needs_ref
  def test_matches_torch_reference(self):
    case = random_case(seed=3)
    ref = ref_aj_rd.compute_redetection_metrics(
        *(torch.from_numpy(np.asarray(x)) for x in case)
    )
    ours = aj_rd.compute_redetection_metrics(*case)
    keys = [k for k in ref if not k.startswith("raw_stats/")]
    assert set(keys) <= set(ours.keys())
    for k in keys:
      r, o = float(ref[k]), float(ours[k])
      if np.isnan(r):
        assert np.isnan(o), k
      else:
        np.testing.assert_allclose(r, o, rtol=1e-6, err_msg=k)


class TestColorAugmentation:

  def test_preserves_shape_and_range(self):
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(3, 16, 16, 3).astype(np.float32) * 2 - 1)
    out = augmentations.color_augmentation(jax.random.PRNGKey(0), video)
    assert out.shape == video.shape
    assert float(out.min()) >= -1.0 - 1e-5
    assert float(out.max()) <= 1.0 + 1e-5

  def test_hsv_round_trip(self):
    rng = np.random.RandomState(1)
    rgb = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32))
    back = augmentations._hsv_to_rgb(augmentations._rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


class TestGeometricAugmentations:

  def test_warp_identity(self):
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    homogs = jnp.stack([jnp.eye(3)] * 2)
    out = augmentations.warp_video(video, homogs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(video), atol=1e-5)

  def test_warp_translation_moves_content(self):
    video = np.zeros((1, 16, 16, 1), np.float32)
    video[0, 4, 4, 0] = 1.0
    shift = np.eye(3)
    shift[0, 2] = 3.0  # x += 3
    out = np.asarray(
        augmentations.warp_video(jnp.asarray(video), jnp.asarray(shift[None]))
    )
    assert out[0, 4, 7, 0] > 0.9
    assert out[0, 4, 4, 0] < 0.1

  def test_roll_transforms_tracks_consistently(self):
    rng = np.random.RandomState(0)
    video = rng.rand(4, 32, 32, 3).astype(np.float32)
    tracks = rng.rand(4, 5, 2).astype(np.float32) * 32
    aug = augmentations.RollAugmentation(p=1.0, rotate=True, seed=1)
    out = aug({"video": video, "tracks": tracks})
    assert out["video"].shape == video.shape
    assert out["tracks"].shape == tracks.shape
    assert not np.allclose(out["tracks"], tracks)

  def test_homography_aug_runs(self):
    rng = np.random.RandomState(0)
    video = rng.rand(3, 32, 32, 3).astype(np.float32)
    tracks = rng.rand(3, 4, 2).astype(np.float32) * 32
    aug = augmentations.HomographyAugmentation(p=1.0, seed=2)
    out = aug({"video": video, "tracks": tracks})
    assert out["video"].shape == video.shape
    assert np.isfinite(out["tracks"]).all()

  def test_prob_zero_is_identity(self):
    video = np.zeros((2, 8, 8, 3), np.float32)
    tracks = np.zeros((2, 3, 2), np.float32)
    aug = augmentations.RollAugmentation(p=0.0, seed=0)
    out = aug({"video": video, "tracks": tracks})
    np.testing.assert_array_equal(out["video"], video)


class TestAugmentationViz:

  def test_gif_written_and_track_glued_to_dot(self, tmp_path):
    """The overlay marker must land on the warped dot: the dot's centroid
    in the augmented frame equals the augmented track within ~2 px."""
    from tapnet_tpu.data import augmentation_viz, augmentations

    video, tracks = augmentation_viz.make_dot_video(
        num_frames=8, height=128, width=128
    )
    aug = augmentations.RollAugmentation(p=1.1, strength=1.0, seed=0)
    out = aug({"video": video.astype(np.float32), "tracks": tracks})
    # The dot is pure red; the out-of-frame constant fill is black, so a
    # red mask isolates the dot regardless of how much border the warp
    # drags in. Only frames where the dot survives (nearly) intact are
    # checked — a clipped dot biases its centroid.
    full_dot_area = np.pi * 20.0**2
    yy, xx = np.mgrid[0:128, 0:128]
    checked = 0
    for t in range(8):
      frame = np.clip(out["video"][t], 0, 255)
      red = (
          (frame[..., 0] > 180) & (frame[..., 1] < 80) & (frame[..., 2] < 80)
      ).astype(np.float64)
      if red.sum() < 0.8 * full_dot_area:
        continue
      cx = (xx * red).sum() / red.sum()
      cy = (yy * red).sum() / red.sum()
      np.testing.assert_allclose([cx, cy], out["tracks"][t, 0], atol=2.0)
      checked += 1
    assert checked >= 2, "warp pushed the dot off-frame in nearly all frames"

    path = augmentation_viz.visualize(
        "homography", str(tmp_path / "h.gif"), num_frames=6
    )
    assert os.path.getsize(path) > 0


class TestWarpVideoU8:

  def test_matches_float_warp_rounded(self):
    rng = np.random.RandomState(0)
    video = (rng.rand(3, 16, 16, 3) * 255).astype(np.uint8)
    homogs = np.tile(np.eye(3), (3, 1, 1))
    homogs[:, 0, 2] = [0.0, 1.5, -2.0]  # per-frame x shifts
    ref = np.clip(
        np.round(
            np.asarray(
                augmentations.warp_video(
                    jnp.asarray(video, jnp.float32), jnp.asarray(homogs)
                )
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    out = np.asarray(
        augmentations.warp_video_u8(jnp.asarray(video), jnp.asarray(homogs))
    )
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, ref)
