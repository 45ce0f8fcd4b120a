"""RoboTAP tests: motion clustering recovers planted rigid groups; dense
tracking runs end-to-end with a tiny causal TAPIR."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.robotap import clustering, dense_tracking


class TestProjectionMatrix:

  def test_orthonormal_rows(self):
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(5, 2 * 12).astype(np.float32))
    mats = clustering.make_projection_matrix(raw, fourdof=False)
    assert mats.shape == (5, 2, 3, 4)
    r = np.asarray(mats)[..., :3]
    rrt = np.einsum("fkij,fklj->fkil", r, r)
    np.testing.assert_allclose(
        rrt, np.broadcast_to(np.eye(3), rrt.shape), atol=1e-5
    )

  def test_fourdof_structure(self):
    rng = np.random.RandomState(1)
    raw = jnp.asarray(rng.randn(3, 12).astype(np.float32))
    mats = np.asarray(clustering.make_projection_matrix(raw, fourdof=True))
    # Third rotation row is +z: no out-of-plane rotation.
    np.testing.assert_allclose(mats[:, 0, 2, :3], [[0, 0, 1]] * 3, atol=1e-6)


class TestClustering:

  def test_two_rigid_groups_separate(self):
    """Two groups of points moving with distinct 2D translations should be
    assigned to different clusters."""
    rng = np.random.RandomState(0)
    n_per, t = 24, 20
    base1 = rng.rand(n_per, 2) * 0.3 + 0.1
    base2 = rng.rand(n_per, 2) * 0.3 + 0.6
    vel1 = np.array([0.012, 0.004])
    vel2 = np.array([-0.01, 0.008])
    frames = np.arange(t)[None, :, None]
    tracks1 = base1[:, None] + vel1 * frames
    tracks2 = base2[:, None] + vel2 * frames
    tracks = np.concatenate([tracks1, tracks2], 0) * 100  # pixels
    vis = np.ones((2 * n_per, t))

    out = clustering.compute_clusters(
        {"ep": tracks},
        {"ep": vis},
        ["ep"],
        {"ep": (t, 100, 100, 3)},
        final_num_cats=2,
        max_num_cats=3,
        iters_before_split=60,
        point_sample=48,
        frame_sample=20,
        verbose=False,
    )
    classes = out["classes"]
    assert classes.shape == (2 * n_per,)
    # All of group 1 together, all of group 2 together, different labels.
    g1 = classes[:n_per]
    g2 = classes[n_per:]
    assert (g1 == g1[0]).mean() > 0.9
    assert (g2 == g2[0]).mean() > 0.9
    assert g1[0] != g2[0]

  def test_low_visibility_filtered(self):
    rng = np.random.RandomState(1)
    tracks = rng.rand(10, 8, 2) * 50
    vis = np.ones((10, 8))
    vis[7:] = 0.0  # three invisible tracks
    out = clustering.compute_clusters(
        {"ep": tracks},
        {"ep": vis},
        ["ep"],
        {"ep": (8, 50, 50, 3)},
        final_num_cats=1,
        max_num_cats=2,
        iters_before_split=10,
        point_sample=10,
        frame_sample=8,
        verbose=False,
    )
    assert out["classes"].shape == (7,)


class TestDenseTracking:

  def test_track_many_points_end_to_end(self):
    from tapnet_tpu.models import tapir as tapir_lib

    config = tapir_lib.TapirConfig(
        num_mixer_blocks=2,
        num_pips_iter=2,
        pyramid_level=1,
        use_causal_conv=True,
        initial_resolution=(32, 32),
        blocks_per_group=(1, 1, 1, 1),
    )
    model = tapir_lib.TAPIR(config=config)
    rng = np.random.RandomState(0)
    video = (rng.rand(4, 32, 32, 3) * 255).astype(np.uint8)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 32, 32, 3)),
        jnp.zeros((1, 4, 3)),
    )["params"]

    out = dense_tracking.track_many_points(
        video, params, config, num_points=8, seed=0
    )
    assert out["tracks"].shape == (8, 4, 2)
    assert out["visibility"].shape == (8, 4)
    assert out["query_points"].shape == (8, 3)
    # Nothing is visible before its query frame.
    qts = out["query_points"][:, 0].astype(int)
    for i, qt in enumerate(qts):
      assert not out["visibility"][i, :qt].any()
