"""TAPVid-3D metric tests: reference parity across scaling strategies +
golden cases + end-to-end npz-directory evaluation."""

import io
import os

import numpy as np
import pytest

from tapnet_tpu.tapvid3d import evaluate as eval3d
from tapnet_tpu.tapvid3d import metrics as metrics3d

try:
  from tapnet.tapvid3d.evaluation import metrics as ref_metrics

  HAS_REF = True
except Exception:
  HAS_REF = False

needs_ref = pytest.mark.skipif(not HAS_REF, reason="reference not importable")


def random_case(seed=0, n=8, t=12):
  rng = np.random.RandomState(seed)
  gt_occ = rng.rand(n, t) > 0.75
  gt_tracks = rng.rand(n, t, 3) * np.array([2.0, 2.0, 5.0]) + np.array(
      [-1.0, -1.0, 1.0]
  )
  pred_occ = rng.rand(n, t) > 0.7
  pred_tracks = gt_tracks * 1.1 + rng.randn(n, t, 3) * 0.05
  intrinsics = np.array([500.0, 510.0, 128.0, 128.0])
  qp = np.stack(
      [
          rng.randint(0, t, n).astype(np.float64),
          rng.rand(n) * 256,
          rng.rand(n) * 256,
      ],
      axis=-1,
  )
  return gt_occ, gt_tracks, pred_occ, pred_tracks, intrinsics, qp


class TestMetrics3D:

  def test_perfect_prediction(self):
    gt_occ, gt_tracks, _, _, intr, qp = random_case()
    out = metrics3d.compute_tapvid3d_metrics(
        gt_occ, gt_tracks, gt_occ, gt_tracks, intr, scaling="median"
    )
    np.testing.assert_allclose(out["average_jaccard"], 1.0)
    np.testing.assert_allclose(out["occlusion_accuracy"], 1.0)

  def test_global_scale_invariance_with_median(self):
    """median scaling should undo a uniform depth scale on predictions."""
    gt_occ, gt_tracks, _, _, intr, qp = random_case(seed=1)
    scaled_pred = gt_tracks * 3.7
    out = metrics3d.compute_tapvid3d_metrics(
        gt_occ, gt_tracks, gt_occ, scaled_pred, intr, scaling="median"
    )
    np.testing.assert_allclose(out["average_jaccard"], 1.0)

  @needs_ref
  @pytest.mark.parametrize(
      "scaling",
      ["median", "mean", "none", "reproduce_2d", "per_trajectory",
       "median_on_queries", "local_neighborhood"],
  )
  def test_matches_reference(self, scaling):
    case = random_case(seed=2)
    gt_occ, gt_tracks, pred_occ, pred_tracks, intr, qp = case
    # The reference requires query_points pre-batched for the per-query
    # scalings even when tracks are unbatched (it crashes otherwise); feed
    # both implementations the batched form for identical semantics. Ours
    # additionally accepts the unbatched form.
    if scaling in ("per_trajectory", "median_on_queries"):
      qp = qp[None]
    kwargs = dict(
        gt_occluded=gt_occ,
        gt_tracks=gt_tracks,
        pred_occluded=pred_occ,
        pred_tracks=pred_tracks,
        intrinsics_params=intr,
        scaling=scaling,
        query_points=qp,
        # The reference's local_neighborhood path only works trackwise (its
        # video-level reduction crashes stacking 0-d arrays).
        get_trackwise_metrics=scaling == "local_neighborhood",
    )
    ref = ref_metrics.compute_tapvid3d_metrics(**kwargs)
    ours = metrics3d.compute_tapvid3d_metrics(**kwargs)
    assert set(ref) == set(ours)
    for k in ref:
      np.testing.assert_allclose(
          np.squeeze(ref[k]),
          np.squeeze(ours[k]),
          rtol=1e-9,
          atol=1e-12,
          err_msg=f"{scaling}/{k}",
      )

  @needs_ref
  def test_matches_reference_fixed_thresholds_tn_order(self):
    gt_occ, gt_tracks, pred_occ, pred_tracks, intr, qp = random_case(seed=3)
    kwargs = dict(
        gt_occluded=gt_occ.T,
        gt_tracks=np.transpose(gt_tracks, (1, 0, 2)),
        pred_occluded=pred_occ.T,
        pred_tracks=np.transpose(pred_tracks, (1, 0, 2)),
        intrinsics_params=intr,
        scaling="median",
        use_fixed_metric_threshold=True,
        order="t n",
    )
    ref = ref_metrics.compute_tapvid3d_metrics(**kwargs)
    ours = metrics3d.compute_tapvid3d_metrics(**kwargs)
    for k in ref:
      np.testing.assert_allclose(ref[k], ours[k], rtol=1e-9, err_msg=k)

  def test_projection_round_trip(self):
    intr = np.array([500.0, 510.0, 128.0, 126.0])
    xyz = np.array([[0.5, -0.2, 3.0], [0.0, 0.0, 1.0]])
    uv = metrics3d.project_to_pixels(xyz, intr)
    back = metrics3d.unproject_pixels(uv, xyz[..., 2], intr)
    np.testing.assert_allclose(back, xyz, rtol=1e-12)


class TestEvaluateCLI:

  def make_npz_pair(self, tmp_path, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    t, n = 4, 5
    img = Image.fromarray(
        (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    jpeg = buf.getvalue()

    tracks = rng.rand(t, n, 3) + np.array([0, 0, 2.0])
    vis = rng.rand(t, n) > 0.3
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    np.savez(
        gt_dir / "vid.npz",
        images_jpeg_bytes=np.array([jpeg] * t, object),
        queries_xyt=rng.rand(n, 3) * np.array([96, 64, t]),
        tracks_XYZ=tracks,
        visibility=vis,
        fx_fy_cx_cy=np.array([100.0, 100.0, 48.0, 32.0]),
    )
    np.savez(
        pred_dir / "vid.npz", tracks_XYZ=tracks * 2.0, visibility=vis
    )
    return str(gt_dir), str(pred_dir)

  def test_directory_evaluation(self, tmp_path):
    gt_dir, pred_dir = self.make_npz_pair(tmp_path)
    results = eval3d.evaluate_directory(
        gt_dir, pred_dir, ["median"], verbose=False
    )
    # Predictions = GT * 2 with median scaling -> perfect.
    np.testing.assert_allclose(results["median"]["average_jaccard"], 1.0)

  def test_intrinsics_rescale(self):
    assert eval3d.rescale_factor_for_short_side(64, 96) == 4.0
    assert eval3d.rescale_factor_for_short_side(512, 256) == 1.0
