"""TAP-Vid metrics and query-sampler tests: golden values + reference parity."""

import sys
import types

import numpy as np
import pytest

from tapnet_tpu.tapvid import datasets, metrics


def _import_reference_eval():
  """The reference module imports mediapy/tfds (absent); stub them — metrics
  and samplers are pure numpy."""
  try:
    for mod in ("mediapy", "tensorflow_datasets"):
      if mod not in sys.modules:
        sys.modules[mod] = types.ModuleType(mod)
    from tapnet.tapvid import evaluation_datasets  # type: ignore

    return evaluation_datasets
  except Exception:
    return None


REF = _import_reference_eval()
needs_ref = pytest.mark.skipif(REF is None, reason="reference not importable")


def random_case(seed=0, b=2, n=12, t=24):
  rng = np.random.RandomState(seed)
  query_points = np.stack(
      [
          rng.randint(0, t, (b, n)).astype(np.float64),
          rng.rand(b, n) * 256,
          rng.rand(b, n) * 256,
      ],
      axis=-1,
  )
  gt_occ = rng.rand(b, n, t) > 0.7
  gt_tracks = rng.rand(b, n, t, 2) * 256
  pred_occ = rng.rand(b, n, t) > 0.6
  pred_tracks = gt_tracks + rng.randn(b, n, t, 2) * 4
  return query_points, gt_occ, gt_tracks, pred_occ, pred_tracks


class TestMetrics:

  def test_perfect_prediction(self):
    qp, gt_occ, gt_tracks, _, _ = random_case()
    out = metrics.compute_tapvid_metrics(
        qp, gt_occ, gt_tracks, gt_occ, gt_tracks, "strided"
    )
    np.testing.assert_allclose(out["average_jaccard"], 1.0)
    np.testing.assert_allclose(out["occlusion_accuracy"], 1.0)
    np.testing.assert_allclose(out["average_pts_within_thresh"], 1.0)

  def test_threshold_semantics(self):
    # One visible point, constant 3px error: inside thresholds 4/8/16 only.
    qp = np.array([[[0.0, 10.0, 10.0]]])
    gt_occ = np.zeros((1, 1, 4), bool)
    gt_tracks = np.ones((1, 1, 4, 2)) * 100
    pred = gt_tracks + np.array([3.0, 0.0])
    out = metrics.compute_tapvid_metrics(
        qp, gt_occ, gt_tracks, gt_occ, pred, "first"
    )
    assert out["pts_within_1"][0] == 0.0
    assert out["pts_within_2"][0] == 0.0
    assert out["pts_within_4"][0] == 1.0
    np.testing.assert_allclose(out["average_pts_within_thresh"][0], 0.6)

  def test_first_mode_ignores_before_query(self):
    qp = np.array([[[2.0, 10.0, 10.0]]])
    gt_occ = np.zeros((1, 1, 5), bool)
    gt_tracks = np.ones((1, 1, 5, 2)) * 50
    pred = gt_tracks.copy()
    pred[0, 0, :3] += 100.0  # errors only on/before query frame
    out = metrics.compute_tapvid_metrics(
        qp, gt_occ, gt_tracks, gt_occ, pred, "first"
    )
    np.testing.assert_allclose(out["average_jaccard"][0], 1.0)

  @needs_ref
  @pytest.mark.parametrize("mode", ["first", "strided"])
  @pytest.mark.parametrize("trackwise", [False, True])
  def test_matches_reference(self, mode, trackwise):
    case = random_case(seed=3)
    ref = REF.compute_tapvid_metrics(
        *case, query_mode=mode, get_trackwise_metrics=trackwise
    )
    ours = metrics.compute_tapvid_metrics(
        *case, query_mode=mode, get_trackwise_metrics=trackwise
    )
    assert set(ref.keys()) == set(ours.keys())
    for k in ref:
      np.testing.assert_allclose(ref[k], ours[k], rtol=1e-9, err_msg=k)

  @needs_ref
  def test_latex_table_matches(self):
    case = random_case(seed=4)
    ours = metrics.compute_tapvid_metrics(*case, query_mode="strided")
    mean = {k: np.mean(v) for k, v in ours.items()}
    assert metrics.latex_table(mean) == REF.latex_table(mean)


class TestSamplers:

  def make_tracks(self, seed=0, n=7, t=13):
    rng = np.random.RandomState(seed)
    occ = rng.rand(n, t) > 0.6
    occ[:, 0] = rng.rand(n) > 0.5  # some visible at frame 0
    pts = rng.rand(n, t, 2)
    frames = rng.rand(t, 8, 8, 3).astype(np.float32) * 2 - 1
    return occ, pts, frames

  @needs_ref
  def test_strided_matches_reference(self):
    occ, pts, frames = self.make_tracks()
    ref = REF.sample_queries_strided(occ, pts, frames)
    ours = datasets.sample_queries_strided(occ, pts, frames)
    for k in ref:
      np.testing.assert_allclose(ref[k], ours[k], err_msg=k)

  @needs_ref
  def test_first_matches_reference(self):
    occ, pts, frames = self.make_tracks(seed=2)
    ref = REF.sample_queries_first(occ, pts, frames)
    ours = datasets.sample_queries_first(occ, pts, frames)
    for k in ref:
      np.testing.assert_allclose(ref[k], ours[k], err_msg=k)

  def test_first_query_is_first_visible(self):
    occ = np.array([[True, True, False, False]])
    pts = np.arange(8, dtype=np.float64).reshape(1, 4, 2)
    frames = np.zeros((4, 4, 4, 3), np.float32)
    out = datasets.sample_queries_first(occ, pts, frames)
    np.testing.assert_allclose(out["query_points"][0, 0], [2.0, 5.0, 4.0])
