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


class TestSplits:
  """Vendored split lists must match the reference's literal tables."""

  def test_vendored_counts(self):
    from tapnet_tpu.tapvid3d import splits

    assert len(splits.get_minival_files("adt")) == 50
    assert len(splits.get_full_eval_files("adt")) == 1906
    assert len(splits.get_minival_files("pstudio")) == 50
    assert len(splits.get_full_eval_files("pstudio")) == 106
    assert len(splits.get_minival_files("drivetrack")) == 50
    assert len(splits.get_full_eval_files("drivetrack")) == 2407

  @needs_ref
  def test_matches_reference_lists(self):
    from tapnet.tapvid3d.splits import tapvid3d_splits as ref_splits

    from tapnet_tpu.tapvid3d import splits

    for source in splits.SOURCES:
      assert splits.get_minival_files(source) == list(
          ref_splits.get_minival_files(source)
      )
      assert splits.get_full_eval_files(source) == list(
          ref_splits.get_full_eval_files(source)
      )
      assert sorted(splits.get_all_files(source)) == sorted(
          ref_splits.get_all_files(source)
      )

  def test_env_override(self, tmp_path, monkeypatch):
    from tapnet_tpu.tapvid3d import splits

    (tmp_path / "adt_minival.txt").write_text("a.npz\nb.npz\n")
    monkeypatch.setenv(splits.SPLITS_DIR_ENV, str(tmp_path))
    assert splits.get_minival_files("adt") == ["a.npz", "b.npz"]


class TestAdtGeneration:

  @needs_ref
  def test_v2_name_rule_matches_reference_mapping(self):
    from tapnet.tapvid3d.annotation_generation import adt_v1v2_mappings

    from tapnet_tpu.tapvid3d import adt

    for v1, v2 in adt_v1v2_mappings.ADT_MAPPINGS.items():
      assert adt.adt_v2_sequence_name(v1) == v2

  def test_rotate_upright_is_clockwise(self):
    from tapnet_tpu.tapvid3d import adt

    im = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    rot = adt.rotate_upright(im)
    # Clockwise 90: bottom-left pixel becomes top-left.
    np.testing.assert_array_equal(rot[0, 0], im[1, 0])
    np.testing.assert_array_equal(rot[0, 1], im[0, 0])

  def test_process_sequence_with_fake_reader(self, tmp_path):
    from tapnet_tpu.tapvid3d import adt, generation

    rng = np.random.RandomState(0)
    frames_per_chunk = adt.N_FRAMES
    total = 2 * frames_per_chunk
    # Smooth per-frame gradients (JPEG-friendly, unlike noise).
    yy, xx = np.mgrid[0:8, 0:8]
    video = np.stack(
        [
            np.stack(
                [(yy * 16 + i) % 256, (xx * 16) % 256,
                 np.full_like(yy, i % 256)], -1
            )
            for i in range(total)
        ]
    ).astype(np.uint8)

    class FakeReader:
      timestamps_ns = np.arange(total) * 100

      def read_chunk(self, ts):
        return [video[int(t) // 100] for t in ts]

    # Released-style annotation npz for chunk 1 (means of the ROTATED
    # frames, as the reference computes them post-rotation).
    n, t = 5, frames_per_chunk
    chunk_frames = [
        adt.rotate_upright(f) for f in video[frames_per_chunk:]
    ]
    ann = dict(
        queries_xyt=rng.rand(n, 3).astype(np.float32),
        tracks_XYZ=rng.rand(t, n, 3).astype(np.float32),
        visibility=(rng.rand(t, n) > 0.3),
        video_means=np.stack(
            [f.mean(axis=(0, 1)) for f in chunk_frames]
        ),
    )
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    np.savez(in_dir / "MySeq_seq001_1.npz", **ann)

    written = adt.process_sequence(
        "", str(in_dir), str(out_dir), "MySeq_seq001", [1],
        reader=FakeReader(),
    )
    assert written == [str(out_dir / "MySeq_seq001_1.npz")]
    summary = generation.verify_example(written[0])
    assert summary["num_frames"] == t and summary["num_tracks"] == n
    # JPEGs decode back to frames (lossy, so just check shape + closeness).
    from PIL import Image

    with np.load(written[0], allow_pickle=True) as z:
      decoded = np.array(
          Image.open(io.BytesIO(z["images_jpeg_bytes"][0]))
      )
    assert decoded.shape == (8, 8, 3)
    assert np.abs(
        decoded.astype(int) - chunk_frames[0].astype(int)
    ).mean() < 20

  def test_mean_mismatch_raises(self, tmp_path):
    from tapnet_tpu.tapvid3d import adt

    rng = np.random.RandomState(1)
    frames = [rng.randint(0, 255, (4, 4, 3), dtype=np.uint8)]
    ann = dict(
        queries_xyt=np.zeros((1, 3)),
        tracks_XYZ=np.zeros((1, 1, 3)),
        visibility=np.zeros((1, 1), bool),
        video_means=np.zeros((1, 3)),
    )
    with pytest.raises(ValueError, match="video_means"):
      adt.assemble_example(frames, ann)

  def test_pending_chunks_grouping(self, tmp_path):
    from tapnet_tpu.tapvid3d import adt

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir(), out_dir.mkdir()
    for name in ("Seq_A_seq01_0.npz", "Seq_A_seq01_2.npz",
                 "Seq_B_seq02_1.npz"):
      np.savez(in_dir / name, x=np.zeros(1))
    np.savez(out_dir / "Seq_A_seq01_2.npz", x=np.zeros(1))  # done already
    pending = adt.pending_chunks_by_sequence(str(in_dir), str(out_dir))
    assert pending == {"Seq_A_seq01": [0], "Seq_B_seq02": [1]}


class TestGenerationDownload:

  def test_download_split_debug_one_file(self, tmp_path):
    """download_split fetches split files (file:// base URL stand-in)."""
    from tapnet_tpu.tapvid3d import generation, splits

    src = tmp_path / "bucket" / "drivetrack"
    src.mkdir(parents=True)
    name = splits.get_minival_files("drivetrack")[0]
    np.savez(src / name, x=np.arange(3))
    out = tmp_path / "out"
    got = generation.download_split(
        "drivetrack", "minival", str(out),
        base_url="file://" + str(tmp_path / "bucket"), debug=True,
        verbose=False,
    )
    assert len(got) == 1 and os.path.exists(got[0])
    with np.load(got[0]) as z:
      np.testing.assert_array_equal(z["x"], np.arange(3))

  def test_missing_file_fails_loudly(self, tmp_path):
    import urllib.error

    from tapnet_tpu.tapvid3d import generation

    with pytest.raises(urllib.error.URLError):
      generation.download_annotations(
          "drivetrack", ["does_not_exist.npz"], str(tmp_path / "out"),
          base_url="file://" + str(tmp_path / "bucket"), verbose=False,
      )
