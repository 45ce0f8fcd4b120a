"""VOTS tracker protocol + TAP-Vid generation tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.tapnextpp import vots_tracker


class TestSupportPoints:

  def test_grid_support_counts(self):
    pts = vots_tracker.grid_support_points(64, 64.0, 64.0)
    assert pts.shape == (64, 2)
    assert pts.min() >= 0 and pts.max() <= 64

  def test_local_support_clamped(self):
    q = np.array([[2.0, 2.0], [500.0, 500.0]], np.float32)
    pts = vots_tracker.local_support_points(q, 16, 32.0, 512, 512)
    assert pts.shape == (32, 2)
    assert pts.min() >= 0
    assert pts.max() <= 511

  def test_coordinate_round_trip(self):
    xy = np.array([[100.0, 50.0]], np.float32)
    m = vots_tracker.display_to_model(xy, 480, 640, 512)
    back = vots_tracker.model_to_display(m, 480, 640, 512)
    np.testing.assert_allclose(back, xy, rtol=1e-5)


class TestVotsTracker:

  def test_initialize_and_track(self):
    from tapnet_tpu.models import ssm_vit, tapnext

    cfg = ssm_vit.SsmVitConfig(
        width=32,
        depth=1,
        mlp_dim=64,
        num_heads=2,
        patch_size=(1, 8, 8),
        image_size=(32, 32),
    )
    model = tapnext.TAPNextTracker(config=cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 32, 32, 3)),
        jnp.zeros((1, 2, 3)),
    )["params"]

    tracker = vots_tracker.VotsPointTracker(
        params, cfg, input_resolution=32, n_support=4, support_radius=8.0
    )
    rng = np.random.RandomState(0)
    frame = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    queries = np.array([[10.0, 20.0], [40.0, 30.0]], np.float32)

    xy, vis = tracker.initialize(frame, queries)
    assert xy.shape == (2, 2)  # support points hidden
    assert vis.shape == (2,)
    xy, vis = tracker.track(frame)
    assert xy.shape == (2, 2)
    # Output is in display space.
    assert 0 <= xy[:, 0].max() <= 64 * 256 / 32  # loose sanity bound


class TestGenerate:

  def test_csv_round_trip(self, tmp_path):
    import cv2

    from tapnet_tpu.tapvid import datasets, generate

    rng = np.random.RandomState(0)
    # Write a tiny video at 25 fps with 250 frames.
    video_dir = tmp_path / "videos"
    video_dir.mkdir()
    name = "abc123_000010_000020"
    path = str(video_dir / f"{name}.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (32, 32)
    )
    for _ in range(250):
      writer.write((rng.rand(32, 32, 3) * 255).astype(np.uint8))
    writer.release()

    # Two tracks in the CSV.
    rows = []
    for _ in range(2):
      fields = ["abc123", "10", "20"]
      for _ in range(250):
        fields += [f"{rng.rand():.4f}", f"{rng.rand():.4f}",
                   str(rng.randint(0, 2))]
      rows.append(",".join(fields))
    csv_path = tmp_path / "ann.csv"
    csv_path.write_text("\n".join(rows))

    out_dir = tmp_path / "out"
    n = generate.generate_dataset(
        str(csv_path), str(video_dir), str(out_dir), "kinetics",
        num_shards=2, verbose=False,
    )
    assert n == 1
    # The generated shards are readable by the kinetics reader.
    examples = list(
        datasets.create_kinetics_dataset(
            str(out_dir), query_mode="first", resolution=(32, 32)
        )
    )
    assert len(examples) == 1
    ex = examples[0]["kinetics"]
    assert ex["video"].shape[1] == 250
    assert ex["occluded"].shape[-1] == 250


class TestVotsResolutionAdaptation:

  def test_runs_above_training_resolution(self):
    """A 32-trained config driven at 64 input: posembs auto-interpolate."""
    from tapnet_tpu.models import ssm_vit, tapnext

    cfg = ssm_vit.SsmVitConfig(
        width=32,
        depth=1,
        mlp_dim=64,
        num_heads=2,
        patch_size=(1, 8, 8),
        image_size=(32, 32),
    )
    model = tapnext.TAPNextTracker(config=cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, 32, 32, 3)),
        jnp.zeros((1, 2, 3)),
    )["params"]

    tracker = vots_tracker.VotsPointTracker(
        params, cfg, input_resolution=64, n_support=4, support_radius=8.0
    )
    rng = np.random.RandomState(0)
    frame = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    queries = np.array([[10.0, 20.0], [40.0, 30.0]], np.float32)
    xy, vis = tracker.initialize(frame, queries)
    assert xy.shape == (2, 2) and vis.shape == (2,)
    xy2, _ = tracker.track(frame)
    assert np.isfinite(xy2).all()
