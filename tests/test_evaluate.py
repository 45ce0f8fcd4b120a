"""End-to-end eval harness smoke test: synthetic DAVIS pickle -> reader ->
predictor -> metrics."""

import pickle

import numpy as np
import pytest

from tapnet_tpu.tapvid import datasets, evaluate


def make_davis_pickle(tmp_path, num_videos=2, t=5, h=32, w=40, n=3):
  rng = np.random.RandomState(0)
  data = {}
  for i in range(num_videos):
    data[f"video_{i}"] = {
        "video": (rng.rand(t, h, w, 3) * 255).astype(np.uint8),
        "points": rng.rand(n, t, 2).astype(np.float32),
        "occluded": rng.rand(n, t) > 0.8,
    }
  path = tmp_path / "davis.pkl"
  with open(path, "wb") as f:
    pickle.dump(data, f)
  return str(path)


class TestReaders:

  def test_davis_reader(self, tmp_path):
    path = make_davis_pickle(tmp_path)
    examples = list(datasets.create_davis_dataset(path, query_mode="first",
                                                  resolution=(16, 16)))
    assert len(examples) == 2
    ex = examples[0]["davis"]
    assert ex["video"].shape[0] == 1
    assert ex["video"].shape[2:] == (16, 16, 3)
    assert ex["video"].min() >= -1.0 and ex["video"].max() <= 1.0
    # target points scaled to raster pixels of the resized video
    assert ex["target_points"].max() <= 16.0
    assert ex["query_points"].shape[-1] == 3


class TestEvaluateHarness:

  def test_oracle_predictor_gets_perfect_metrics(self, tmp_path):
    path = make_davis_pickle(tmp_path)
    ds = list(datasets.create_davis_dataset(path, query_mode="first"))

    def oracle(video, query_points):
      # perfect predictions straight from ground truth
      for el in ds:
        ex = el["davis"]
        if ex["video"].shape == video.shape and np.allclose(
            ex["query_points"], query_points
        ):
          occ = np.where(ex["occluded"], 100.0, -100.0)
          return {
              "tracks": ex["target_points"],
              "occlusion": occ,
              "expected_dist": np.full_like(occ, -100.0),
          }
      raise AssertionError("unknown video")

    results = evaluate.evaluate_dataset(oracle, iter(ds), "first",
                                        verbose=False)
    assert results["average_jaccard"] == pytest.approx(1.0)
    assert results["occlusion_accuracy"] == pytest.approx(1.0)

  def test_model_predictor_end_to_end(self, tmp_path):
    import jax
    from tapnet_tpu import inference
    from tapnet_tpu.models import tapir as tapir_lib

    path = make_davis_pickle(tmp_path, num_videos=1, t=3, h=32, w=40)
    config = tapir_lib.TapirConfig(
        num_mixer_blocks=2,
        num_pips_iter=1,
        pyramid_level=0,
        initial_resolution=(32, 40),
        blocks_per_group=(1, 1, 1, 1),
    )
    model = tapir_lib.TAPIR(config=config)
    video = np.zeros((1, 3, 32, 40, 3), np.float32)
    qp = np.zeros((1, 2, 3), np.float32)
    params = model.init(jax.random.PRNGKey(0), video, qp)["params"]
    predictor = inference.TapirPredictor(
        params, config, query_bucket=4, query_chunk_size=4
    )
    ds = datasets.create_davis_dataset(
        path, query_mode="first", resolution=(32, 40)
    )
    results = evaluate.evaluate_dataset(predictor, ds, "first", verbose=False)
    assert 0.0 <= results["average_jaccard"] <= 1.0
    assert 0.0 <= results["occlusion_accuracy"] <= 1.0


class TestVisualizationDump:

  def test_writes_one_mp4_per_video(self, tmp_path):
    path = make_davis_pickle(tmp_path)
    ds = list(datasets.create_davis_dataset(path, query_mode="first"))

    def dummy(video, query_points):
      t = video.shape[1]
      n = query_points.shape[1]
      return {
          "tracks": np.zeros((1, n, t, 2), np.float32) + 8.0,
          "occlusion": np.full((1, n, t), -10.0, np.float32),
          "expected_dist": np.full((1, n, t), -10.0, np.float32),
      }

    out_dir = tmp_path / "viz"
    evaluate.evaluate_dataset(
        dummy,
        ds,
        "first",
        verbose=False,
        visualization_dir=str(out_dir),
    )
    import os

    files = sorted(os.listdir(out_dir))
    assert files == ["video_0000.mp4", "video_0001.mp4"]
    assert all((out_dir / f).stat().st_size > 0 for f in files)
