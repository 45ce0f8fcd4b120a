"""Config registry, Kubric npz ingest, JHMDB PCK, and visualizer tests."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu import configs
from tapnet_tpu.data import kubric
from tapnet_tpu.data import kubric_convert
from tapnet_tpu.tapvid import jhmdb


class TestConfigs:

  def test_registry_builds_models(self):
    for name in ["tapir", "tapnet", "causal_tapir", "bootstapir"]:
      exp = configs.get_experiment(name)
      model = exp.build_model()
      assert model is not None
      assert exp.total_steps > 0

  def test_reference_hparams(self):
    exp = configs.get_experiment("tapir")
    assert exp.optimizer.base_lr == 1e-3
    assert exp.optimizer.adam_b2 == 0.95
    assert exp.optimizer.weight_decay == 0.1
    assert exp.task.train_chunk_size == 32
    boots = configs.get_experiment("bootstapir")
    assert boots.model_config.extra_convs
    assert boots.model_config.softmax_temperature == 10.0

  def test_unknown_raises(self):
    with pytest.raises(ValueError):
      configs.get_experiment("nope")

  def test_tapnextpp_recipe(self):
    # The TAPNext++ long-video fine-tune preset
    # (reference tapnet/tapnextpp/README.md:9-16).
    from tapnet_tpu.training import trainer

    exp = configs.get_experiment("tapnextpp")
    assert exp.model_kind == "tapnext"
    assert exp.data.num_frames == 1024
    assert exp.data.geometric_augment
    # Long-clip training goes through the time-chunked BPTT builder
    # (full-T ViT-B activations exceed HBM; see trainer).
    assert exp.train_time_chunk == 128
    assert exp.data.num_frames % exp.train_time_chunk == 0
    lb = exp.loss_builder
    assert lb.func is trainer.tapnext_chunked_loss_builder
    assert lb.keywords == {"chunk_size": 128}
    assert exp.optimizer.base_lr < configs.get_experiment(
        "tapnext"
    ).optimizer.base_lr  # fine-tune LR
    assert exp.build_model() is not None


class TestKubricIngest:

  def make_npz_dir(self, tmp_path, n=3, t=4, h=24, w=24, tracks=6):
    rng = np.random.RandomState(0)
    for i in range(n):
      np.savez(
          tmp_path / f"ex_{i}.npz",
          video=(rng.rand(t, h, w, 3) * 255).astype(np.uint8),
          target_points=(rng.rand(tracks, t, 2) * [w, h]).astype(
              np.float32
          ),
          occluded=rng.rand(tracks, t) > 0.7,
      )
    return str(tmp_path)

  def test_training_iterator(self, tmp_path):
    path = self.make_npz_dir(tmp_path)
    it = kubric.training_iterator(
        path, batch_size=2, train_size=(16, 16), num_queries=5,
        color_augment=True,
    )
    batch = next(it)
    assert batch["video"].shape == (2, 4, 16, 16, 3)
    assert batch["query_points"].shape == (2, 5, 3)
    assert batch["target_points"].shape == (2, 5, 4, 2)
    assert batch["occluded"].shape == (2, 5, 4)
    # Queries land on visible frames and match targets on the query frame.
    qp = np.asarray(batch["query_points"])
    tp = np.asarray(batch["target_points"])
    occ = np.asarray(batch["occluded"])
    for b in range(2):
      for q in range(5):
        t = int(qp[b, q, 0])
        assert occ[b, q, t] == 0.0
        np.testing.assert_allclose(
            qp[b, q, 1:], tp[b, q, t][::-1], rtol=1e-5
        )
    # Points rescaled to train resolution.
    assert tp.max() <= 16.0 + 1e-4

  def test_training_iterator_geometric_augment(self, tmp_path):
    # The TAPNext++ roll/homography path: batches keep the contract
    # (shapes, query-on-visible-frame, query==target at query frame) with
    # camera jitter applied to video AND trajectories.
    path = self.make_npz_dir(tmp_path)
    it = kubric.training_iterator(
        path, batch_size=2, train_size=(16, 16), num_queries=5,
        color_augment=False, geometric_augment=True, seed=7,
    )
    batch = next(it)
    assert batch["video"].shape == (2, 4, 16, 16, 3)
    qp = np.asarray(batch["query_points"])
    tp = np.asarray(batch["target_points"])
    occ = np.asarray(batch["occluded"])
    for b in range(2):
      for q in range(5):
        t = int(qp[b, q, 0])
        assert occ[b, q, t] == 0.0
        np.testing.assert_allclose(
            qp[b, q, 1:], tp[b, q, t][::-1], rtol=1e-4, atol=1e-4
        )

  def test_geometric_transform_moves_tracks_with_video(self, tmp_path):
    # A white dot tracked by a point: after roll+homography warping the
    # transformed track must still sit on the dot.
    t, h, w = 4, 48, 48
    video = np.zeros((t, h, w, 3), np.uint8)
    pos = np.array([[24.0, 24.0]] * t, np.float32)  # (x, y) per frame
    for i in range(t):
      x, y = int(pos[i, 0]), int(pos[i, 1])
      video[i, y - 1 : y + 2, x - 1 : x + 2] = 255
    example = {
        "video": video,
        "target_points": pos[None],  # [N=1, T, 2]
        "occluded": np.zeros((1, t), bool),
    }
    transform = kubric.geometric_augmentation(seed=3)
    out = transform(example)
    assert out["video"].dtype == np.uint8
    assert out["video"].shape == video.shape
    moved = False
    for i in range(t):
      x, y = out["target_points"][0, i]
      if not (1 <= x < w - 1 and 1 <= y < h - 1):
        continue  # warped out of frame
      patch = out["video"][i, int(y) - 2 : int(y) + 3,
                           int(x) - 2 : int(x) + 3]
      assert patch.max() > 100, f"frame {i}: track lost the dot"
      if not np.allclose(out["target_points"][0, i], pos[i], atol=0.5):
        moved = True
    assert moved, "augmentation did not move anything (seed picked identity)"


class TestKubricConvert:

  def make_pipeline_examples(self, n=2, t=4, h=24, w=24, tracks=6):
    """Fakes the kubric TF pipeline's numpy output: float video in
    [-1, 1], float64 points, a stray B=1 dim on one example."""
    rng = np.random.RandomState(1)
    for i in range(n):
      ex = {
          "video": rng.rand(t, h, w, 3).astype(np.float32) * 2.0 - 1.0,
          "target_points": rng.rand(tracks, t, 2).astype(np.float64)
          * [w, h],
          "occluded": rng.rand(tracks, t) > 0.7,
      }
      if i == 0:
        ex = {k: v[None] for k, v in ex.items()}
      yield ex

  def test_convert_then_ingest(self, tmp_path):
    out_dir = str(tmp_path / "npz")
    n = kubric_convert.write_examples(
        self.make_pipeline_examples(), out_dir
    )
    assert n == 2
    # The written files feed the production ingest path end-to-end.
    it = kubric.training_iterator(
        out_dir, batch_size=2, train_size=(16, 16), num_queries=5,
        color_augment=False,
    )
    batch = next(it)
    assert batch["video"].shape == (2, 4, 16, 16, 3)
    assert np.asarray(batch["video"]).min() >= -1.0 - 1e-5
    assert batch["query_points"].shape == (2, 5, 3)

  def test_num_examples_cap_and_schema_errors(self, tmp_path):
    out_dir = str(tmp_path / "cap")
    n = kubric_convert.write_examples(
        self.make_pipeline_examples(n=5), out_dir, num_examples=3
    )
    assert n == 3
    assert len(list((tmp_path / "cap").glob("*.npz"))) == 3
    with pytest.raises(KeyError):
      kubric_convert.example_to_npz_arrays({"video": np.zeros((2, 4, 4, 3))})
    with pytest.raises(ValueError):
      kubric_convert.example_to_npz_arrays({
          "video": np.zeros((2, 4, 4, 3), np.uint8),
          "target_points": np.zeros((3, 9, 2)),  # wrong track length
          "occluded": np.zeros((3, 9), bool),
      })


class TestJhmdbPck:

  def test_perfect_predictions(self):
    rng = np.random.RandomState(0)
    j, t = 15, 8
    gt = rng.rand(1, j, t, 2) * [320, 240]
    results = [{
        "pred_pose": gt.copy(),
        "gt_pose_orig": gt.copy(),
        "im_size": np.array([240, 320]),
    }]
    out = jhmdb.pck_evaluate(results)
    for alpha in jhmdb.PCK_ALPHAS:
      assert out[f"PCK@{alpha}"] == 100.0

  def test_far_predictions_zero(self):
    rng = np.random.RandomState(1)
    j, t = 15, 4
    gt = rng.rand(1, j, t, 2) * 100 + 50
    results = [{
        "pred_pose": gt + 1000.0,
        "gt_pose_orig": gt,
        "im_size": np.array([240, 320]),
    }]
    out = jhmdb.pck_evaluate(results)
    assert out["PCK@0.5"] == 0.0


class TestVisualizer:

  def test_visualize_example(self, tmp_path):
    from tapnet_tpu.tapvid import visualize

    rng = np.random.RandomState(0)
    example = {
        "video": (rng.rand(3, 32, 32, 3) * 255).astype(np.uint8),
        "points": rng.rand(4, 3, 2).astype(np.float32),
        "occluded": rng.rand(4, 3) > 0.5,
    }
    out = str(tmp_path / "viz.mp4")
    visualize.visualize_example(example, out)
    import os

    assert os.path.getsize(out) > 0


class TestGeometricAugmentationStrength:

  def test_strength_reaches_augmentations(self):
    # The `strength` knob must be passed through to Roll/Homography
    # (it was silently dropped before r5).
    transform = kubric.geometric_augmentation(seed=0, strength=0.25)
    cells = {
        c.cell_contents.__class__.__name__: c.cell_contents
        for c in transform.__closure__
    }
    assert cells["RollAugmentation"].strength == 0.25
    assert cells["HomographyAugmentation"].strength == 0.25

  def test_zero_strength_is_identity_on_tracks(self):
    rng = np.random.RandomState(0)
    example = {
        "video": (rng.rand(4, 24, 24, 3) * 255).astype(np.uint8),
        "target_points": rng.rand(3, 4, 2).astype(np.float32) * 24,
        "occluded": np.zeros((3, 4), bool),
    }
    transform = kubric.geometric_augmentation(seed=1, strength=0.0)
    out = transform(example)
    np.testing.assert_allclose(
        out["target_points"], example["target_points"], atol=1e-3
    )


class TestComposedGeometricWarp:
  """kubric.geometric_augmentation composes roll+homography into ONE warp."""

  def test_tracks_match_chained_augmentations(self):
    # The composed matrices must transform tracks exactly like applying
    # RollAugmentation then HomographyAugmentation (same seeds).
    from tapnet_tpu.data import augmentations

    rng = np.random.RandomState(0)
    video = (rng.rand(5, 24, 24, 3) * 255).astype(np.uint8)
    target_points = rng.rand(6, 5, 2).astype(np.float32) * 24
    example = {
        "video": video,
        "target_points": target_points,
        "occluded": np.zeros((6, 5), bool),
    }
    out = kubric.geometric_augmentation(seed=9)(example)

    roll = augmentations.RollAugmentation(seed=9)
    homog = augmentations.HomographyAugmentation(seed=10)
    data = {
        "video": video.astype(np.float32),
        "tracks": np.transpose(target_points, (1, 0, 2)),
    }
    chained = homog(roll(data))
    np.testing.assert_allclose(
        out["target_points"],
        np.transpose(chained["tracks"], (1, 0, 2)),
        atol=1e-3,
    )
    # The single-resample video agrees with the double-resample one away
    # from interpolation differences (composed is the less blurred of the
    # two; exact equality is not expected).
    chained_u8 = np.clip(np.round(chained["video"]), 0, 255).astype(np.uint8)
    diff = np.abs(
        out["video"].astype(np.int32) - chained_u8.astype(np.int32)
    )
    assert np.median(diff) <= 2.0

  def test_no_fire_returns_example_unchanged(self):
    rng = np.random.RandomState(1)
    example = {
        "video": (rng.rand(3, 16, 16, 3) * 255).astype(np.uint8),
        "target_points": rng.rand(4, 3, 2).astype(np.float32) * 16,
        "occluded": np.zeros((4, 3), bool),
    }
    transform = kubric.geometric_augmentation(seed=0)
    # Force both p-draws to fail by zeroing the probabilities.
    for cell in transform.__closure__:
      if hasattr(cell.cell_contents, "p"):
        cell.cell_contents.p = -1.0
    out = transform(example)
    np.testing.assert_array_equal(out["video"], example["video"])
    np.testing.assert_array_equal(
        out["target_points"], example["target_points"]
    )
