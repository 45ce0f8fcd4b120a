"""L0 numerics: transforms, sampling, soft-argmax, losses.

Each primitive is pinned two ways: hand-computed golden values, and (where
the reference's deps are installed) a direct numerical parity check against
the reference implementation acting as an oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.utils import losses, sampling, transforms


def try_import_reference_utils():
  try:
    from tapnet.utils import model_utils  # type: ignore

    return model_utils
  except Exception:
    return None


REF_UTILS = try_import_reference_utils()
needs_ref = pytest.mark.skipif(
    REF_UTILS is None, reason="reference oracle not importable"
)


class TestConvertGridCoordinates:

  def test_identity(self):
    pts = jnp.array([[1.5, 2.5]])
    out = transforms.convert_grid_coordinates(pts, (10, 20), (10, 20))
    np.testing.assert_allclose(out, pts)

  def test_scale(self):
    pts = jnp.array([[4.0, 8.0]])
    out = transforms.convert_grid_coordinates(pts, (8, 16), (16, 32))
    np.testing.assert_allclose(out, [[8.0, 16.0]])

  def test_tyx_keeps_time(self):
    pts = jnp.array([[3.0, 4.0, 8.0]])
    out = transforms.convert_grid_coordinates(
        pts, (10, 8, 16), (10, 16, 32), coordinate_format="tyx"
    )
    np.testing.assert_allclose(out, [[3.0, 8.0, 16.0]])

  def test_frame_count_change_raises(self):
    with pytest.raises(ValueError):
      transforms.convert_grid_coordinates(
          jnp.zeros((1, 3)), (10, 8, 16), (5, 8, 16), coordinate_format="tyx"
      )


class TestSampling:

  def test_center_exact(self):
    grid = jnp.arange(12, dtype=jnp.float32).reshape(3, 4, 1)
    # Pixel (1, 2) center is at raster (y=1.5, x=2.5); value = 1*4+2 = 6.
    out = sampling.sample_grid_2d(grid, jnp.array([[1.5, 2.5]]))
    np.testing.assert_allclose(out, [[6.0]])

  def test_midpoint(self):
    grid = jnp.array([[0.0, 2.0]])[..., None]  # [1, 2, 1]
    out = sampling.sample_grid_2d(grid, jnp.array([[0.5, 1.0]]))
    np.testing.assert_allclose(out, [[1.0]])

  def test_constant_mode_zero_outside(self):
    grid = jnp.ones((4, 4, 1))
    out = sampling.sample_grid_2d(
        grid, jnp.array([[-3.0, -3.0]]), mode="constant"
    )
    np.testing.assert_allclose(out, [[0.0]])

  def test_nearest_mode_clamps(self):
    grid = jnp.arange(4, dtype=jnp.float32).reshape(1, 4, 1)
    out = sampling.sample_grid_2d(grid, jnp.array([[0.5, 100.0]]))
    np.testing.assert_allclose(out, [[3.0]])

  @needs_ref
  def test_matches_reference_2d(self):
    rng = np.random.RandomState(0)
    grid = rng.randn(9, 13).astype(np.float32)
    pts = (rng.rand(40, 2) * np.array([11.0, 16.0]) - 1.5).astype(np.float32)
    for mode in ("nearest", "constant"):
      ref = REF_UTILS.interp(jnp.asarray(grid), jnp.asarray(pts), mode=mode)
      ours = sampling.sample_grid_2d(
          jnp.asarray(grid)[..., None], jnp.asarray(pts), mode=mode
      )[..., 0]
      np.testing.assert_allclose(ref, ours, rtol=1e-6, atol=1e-6)

  @needs_ref
  def test_matches_reference_3d(self):
    rng = np.random.RandomState(1)
    grid = rng.randn(5, 9, 13).astype(np.float32)
    pts = (
        rng.rand(40, 3) * np.array([6.0, 11.0, 16.0]) - 1.0
    ).astype(np.float32)
    for mode in ("nearest", "constant"):
      ref = REF_UTILS.interp(jnp.asarray(grid), jnp.asarray(pts), mode=mode)
      ours = sampling.sample_grid_3d(
          jnp.asarray(grid)[..., None], jnp.asarray(pts), mode=mode
      )[..., 0]
      np.testing.assert_allclose(ref, ours, rtol=1e-6, atol=1e-6)


class TestSoftArgmax:

  def test_peak_center(self):
    heat = jnp.zeros((8, 8)).at[3, 5].set(1.0)
    out = sampling.soft_argmax_heatmap(heat, threshold=5.0)
    np.testing.assert_allclose(out, [5.5, 3.5])

  def test_threshold_excludes_far_mass(self):
    heat = jnp.zeros((16, 16)).at[2, 2].set(0.6).at[14, 14].set(0.4)
    out = sampling.soft_argmax_heatmap(heat, threshold=3.0)
    np.testing.assert_allclose(out, [2.5, 2.5])

  @needs_ref
  def test_matches_reference(self):
    rng = np.random.RandomState(2)
    logits = rng.randn(3, 4, 6, 12, 14).astype(np.float32)
    heat = jax.nn.softmax(jnp.asarray(logits), axis=(-1, -2))
    ref = REF_UTILS.soft_argmax_heatmap
    for _ in range(3):
      ref = jax.vmap(ref, (0, None))
    ref_out = ref(heat, 5.0)
    ours = sampling.soft_argmax_heatmap(heat, threshold=5.0)
    np.testing.assert_allclose(ref_out, ours, rtol=1e-5, atol=1e-5)

  @needs_ref
  def test_heatmaps_to_points_matches_reference(self):
    rng = np.random.RandomState(3)
    b, n, t, h, w = 2, 5, 6, 16, 16
    logits = rng.randn(b, n, t, h, w).astype(np.float32)
    heat = jax.nn.softmax(jnp.asarray(logits), axis=(-1, -2))
    im_shape = (b, t, 128, 128, 3)
    qp = np.stack(
        [
            rng.randint(0, t, (b, n)).astype(np.float32),
            rng.rand(b, n) * 128,
            rng.rand(b, n) * 128,
        ],
        axis=-1,
    )
    ref_out = REF_UTILS.heatmaps_to_points(
        heat, im_shape, query_points=jnp.asarray(qp)
    )
    ours = sampling.heatmaps_to_points(
        heat, im_shape, query_points=jnp.asarray(qp)
    )
    np.testing.assert_allclose(ref_out, ours, rtol=1e-5, atol=1e-5)


class TestResolutions:

  def test_same_size(self):
    assert sampling.generate_default_resolutions((256, 256), (256, 256)) == [
        (256, 256)
    ]

  @needs_ref
  def test_matches_reference(self):
    for full in [(480, 640), (512, 512), (720, 1280), (256, 384)]:
      ref = REF_UTILS.generate_default_resolutions(full, (256, 256))
      ours = sampling.generate_default_resolutions(full, (256, 256))
      assert list(map(tuple, ref)) == list(map(tuple, ours))


class TestLosses:

  def test_huber_quadratic_region(self):
    tracks = jnp.array([[[[1.0, 2.0]]]])
    target = jnp.array([[[[1.0, 5.0]]]])  # dist 3 < delta 4
    occ = jnp.zeros((1, 1, 1))
    out = losses.huber_loss(tracks, target, occ, reduction_axes=None)
    np.testing.assert_allclose(out, [[[4.5]]], rtol=1e-6)

  def test_huber_linear_region(self):
    tracks = jnp.array([[[[0.0, 0.0]]]])
    target = jnp.array([[[[0.0, 10.0]]]])  # dist 10 > delta 4
    occ = jnp.zeros((1, 1, 1))
    out = losses.huber_loss(tracks, target, occ, reduction_axes=None)
    np.testing.assert_allclose(out, [[[4 * (10 - 2)]]], rtol=1e-6)

  def test_occluded_masked_out(self):
    tracks = jnp.zeros((1, 1, 1, 2))
    target = jnp.ones((1, 1, 1, 2)) * 50
    occ = jnp.ones((1, 1, 1))
    out = losses.huber_loss(tracks, target, occ, reduction_axes=None)
    np.testing.assert_allclose(out, [[[0.0]]])

  @needs_ref
  def test_tapnet_loss_matches_reference(self):
    rng = np.random.RandomState(4)
    b, n, t = 2, 8, 6
    shape = (b, t, 256, 256, 3)
    pts = jnp.asarray(rng.rand(b, n, t, 2).astype(np.float32) * 256)
    tgt = jnp.asarray(rng.rand(b, n, t, 2).astype(np.float32) * 256)
    occ_logits = jnp.asarray(rng.randn(b, n, t).astype(np.float32))
    expd = jnp.asarray(rng.randn(b, n, t).astype(np.float32))
    tgt_occ = jnp.asarray(
        (rng.rand(b, n, t) > 0.7).astype(np.float32)
    )
    ref = REF_UTILS.tapnet_loss(
        pts, occ_logits, tgt, tgt_occ, shape, expected_dist=expd
    )
    ours = losses.tapnet_loss(
        pts, occ_logits, tgt, tgt_occ, shape, expected_dist=expd
    )
    for r, o in zip(ref, ours):
      np.testing.assert_allclose(r, o, rtol=1e-5, atol=1e-6)


class TestPostprocess:

  def test_visible_logic(self):
    occ = jnp.array([[-10.0, 10.0]])
    expd = jnp.array([[-10.0, -10.0]])
    vis = sampling.postprocess_occlusions(occ, expd)
    np.testing.assert_array_equal(vis, [[True, False]])
