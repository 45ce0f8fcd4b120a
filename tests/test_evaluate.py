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


def make_kubric_dir(tmp_path, num_examples=2, t=4, h=32, w=40, n=5):
  rng = np.random.RandomState(1)
  d = tmp_path / "kubric"
  d.mkdir()
  for i in range(num_examples):
    pts = rng.rand(n, t, 2).astype(np.float32) * np.array([w, h])
    np.savez(
        d / f"ex_{i:03d}.npz",
        video=(rng.rand(t, h, w, 3) * 255).astype(np.uint8),
        target_points=pts,
        occluded=rng.rand(n, t) > 0.8,
    )
  return str(d)


class TestKubricEval:
  """The reference's eval_kubric mode (evaluation_datasets.py:441-487)."""

  def test_kubric_reader(self, tmp_path):
    path = make_kubric_dir(tmp_path)
    examples = list(
        datasets.create_kubric_dataset(
            path, query_mode="first", train_size=(16, 16)
        )
    )
    assert len(examples) == 2
    ex = examples[0]["kubric"]
    assert ex["video"].shape[0] == 1
    assert ex["video"].shape[2:] == (16, 16, 3)
    assert ex["video"].min() >= -1.0 and ex["video"].max() <= 1.0
    # npz points are raster at video resolution; reader rescales to the
    # eval resolution.
    assert ex["target_points"].max() <= 16.0
    assert ex["query_points"].shape[-1] == 3

  def test_reader_is_deterministic_and_capped(self, tmp_path):
    path = make_kubric_dir(tmp_path, num_examples=3)
    a = list(datasets.create_kubric_dataset(path, "strided", (16, 16)))
    b = list(datasets.create_kubric_dataset(path, "strided", (16, 16)))
    assert len(a) == 3
    np.testing.assert_array_equal(
        a[1]["kubric"]["query_points"], b[1]["kubric"]["query_points"]
    )
    capped = list(
        datasets.create_kubric_dataset(
            path, "strided", (16, 16), max_dataset_size=2
        )
    )
    assert len(capped) == 2

  def test_in_train_eval_logs_aj_to_jsonl(self, tmp_path):
    # Trainer.fit(eval_fn=make_eval_fn(...)) evaluates on held-out kubric
    # batches and logs AJ to the JSONL sink (the reference's in-train
    # eval_kubric epoch, experiment.py:193-197).
    import json

    import jax
    from tapnet_tpu.data import synthetic
    from tapnet_tpu.models import tapir as tapir_lib
    from tapnet_tpu.parallel import mesh as mesh_lib
    from tapnet_tpu.training import optimizers, trainer

    path = make_kubric_dir(tmp_path, num_examples=1, t=3, h=32, w=32)
    config = tapir_lib.TapirConfig(
        num_mixer_blocks=2,
        num_pips_iter=1,
        pyramid_level=0,
        initial_resolution=(32, 32),
        blocks_per_group=(1, 1, 1, 1),
    )
    model = tapir_lib.TAPIR(config=config)
    eval_fn = evaluate.make_eval_fn(
        model,
        lambda: datasets.create_kubric_dataset(
            path, query_mode="first", train_size=(32, 32)
        ),
        query_mode="first",
        query_chunk_size=8,
    )
    t = trainer.Trainer(
        model,
        optimizers.OptimizerConfig(base_lr=1e-3, warmup_steps=2),
        total_steps=4,
        task=trainer.TaskConfig(train_chunk_size=4),
        mesh=mesh_lib.make_mesh(model_parallel=2),
        checkpoint_path=str(tmp_path / "ckpt.npz"),
        checkpoint_every=0,
    )
    data = synthetic.batch_iterator(
        seed=3, batch_size=4, num_frames=3, height=32, width=32,
        num_queries=8,
    )
    state = t.init_state(next(data))
    t.fit(
        state, data, num_steps=2, log_every=0,
        eval_fn=eval_fn, evaluate_every=2,
    )
    records = [
        json.loads(line) for line in open(t.log_path, encoding="utf-8")
    ]
    evals = [r for r in records if r["kind"] == "eval"]
    assert len(evals) == 1
    assert 0.0 <= evals[0]["average_jaccard"] <= 1.0
    assert evals[0]["step"] == 2


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


class TestEvalFnDispatch:

  def test_make_eval_fn_tapnext(self, tmp_path):
    # make_eval_fn presents a model-generic API; TAPNext models must route
    # through TapnextPredictor (not the TAPIR cost-volume predictor).
    from tapnet_tpu.models import ssm_vit, tapnext
    import jax

    config = ssm_vit.SsmVitConfig(
        width=16, depth=1, mlp_dim=32, num_heads=2,
        patch_size=(1, 8, 8), image_size=(32, 32),
    )
    model = tapnext.TAPNextTracker(config=config)
    path = make_kubric_dir(tmp_path, num_examples=1, t=3, h=32, w=32)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 3, 32, 32, 3), np.float32),
        np.zeros((1, 2, 3), np.float32),
    )["params"]
    eval_fn = evaluate.make_eval_fn(
        model,
        lambda: datasets.create_kubric_dataset(
            path, query_mode="first", train_size=(32, 32)
        ),
        query_mode="first",
    )
    metrics = eval_fn(params)
    assert 0.0 <= metrics["average_jaccard"] <= 1.0
