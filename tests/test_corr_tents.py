"""Fused correlation+tent-patch kernel tests: interpreter mode vs the einsum
reference, equivalence with the model's unfused path, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.ops import corr_tents


@pytest.fixture
def force_interpret():
  corr_tents.FORCE_INTERPRET = True
  yield
  corr_tents.FORCE_INTERPRET = False


def make_inputs(seed=0, bt=3, h=12, w=10, c=8, n=5):
  rng = np.random.RandomState(seed)
  grid = jnp.asarray(rng.randn(bt, h, w, c).astype(np.float32))
  query = jnp.asarray(rng.randn(bt, n, c).astype(np.float32))
  # Centers including out-of-bounds (constant-zero boundary must match).
  cy = jnp.asarray((rng.rand(bt, n) * (h + 6) - 3).astype(np.float32))
  cx = jnp.asarray((rng.rand(bt, n) * (w + 6) - 3).astype(np.float32))
  return grid, query, cy, cx


class TestCorrTents:

  def test_kernel_matches_einsum(self, force_interpret):
    args = make_inputs()
    out = corr_tents._pallas_forward(*args, 7)
    ref = corr_tents._math_reference(*args, 7)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )

  def test_kernel_h_not_multiple_of_slab(self, force_interpret):
    # H larger than one slab and not a multiple of it.
    args = make_inputs(seed=1, bt=2, h=corr_tents._H_SLAB + 7, w=9, c=8, n=3)
    out = corr_tents._pallas_forward(*args, 5)
    ref = corr_tents._math_reference(*args, 5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )

  def test_reference_matches_bilinear_sampling(self):
    """Each tent tap equals bilinear interpolation of the correlation map."""
    grid, query, cy, cx = make_inputs(seed=2, bt=1, n=1)
    p = 3
    out = corr_tents._math_reference(grid, query, cy, cx, p)  # [1,p,p,1]

    corr = jnp.einsum("bhwc,bnc->bnhw", grid, query)[0, 0]
    h, w = corr.shape

    def bilinear(y, x):
      y0, x0 = int(np.floor(y)), int(np.floor(x))
      fy, fx = y - y0, x - x0
      val = 0.0
      for dy, wy in ((0, 1 - fy), (1, fy)):
        for dx, wx in ((0, 1 - fx), (1, fx)):
          yy, xx = y0 + dy, x0 + dx
          if 0 <= yy < h and 0 <= xx < w:
            val += float(corr[yy, xx]) * wy * wx
      return val

    for i in range(p):
      for j in range(p):
        expect = bilinear(
            float(cy[0, 0]) + i - (p - 1) / 2,
            float(cx[0, 0]) + j - (p - 1) / 2,
        )
        np.testing.assert_allclose(
            float(out[0, i, j, 0]), expect, rtol=1e-4, atol=1e-4
        )

  def test_gradients_flow(self, force_interpret):
    grid, query, cy, cx = make_inputs(seed=3)

    def loss(grid, query):
      return jnp.sum(
          corr_tents.corr_tent_patches(grid, query, cy, cx, 5) ** 2
      )

    g1, g2 = jax.grad(loss, argnums=(0, 1))(grid, query)
    ref_loss = lambda grid, query: jnp.sum(
        corr_tents._math_reference(grid, query, cy, cx, 5) ** 2
    )
    r1, r2 = jax.grad(ref_loss, argnums=(0, 1))(grid, query)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), rtol=1e-4,
                               atol=1e-4)

  def test_query_padding(self, force_interpret):
    # n far from the 128 tile: padding must not affect results.
    args = make_inputs(seed=4, n=130)
    out = corr_tents._pallas_forward(*args, 3)
    ref = corr_tents._math_reference(*args, 3)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


class TestQuantizedCorr:
  """int8 corr mode: kernel vs the quantized einsum reference, drift vs
  full precision, straight-through gradients."""

  def test_kernel_matches_quantized_reference(self, force_interpret):
    args = make_inputs(seed=3)
    out = corr_tents._pallas_forward(*args, 7, quantized=True)
    ref = corr_tents._math_reference_quantized(*args, 7)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )

  def test_quantized_drift_vs_fp_small(self):
    # Unit-norm descriptors (the model L2-normalizes feature grids):
    # int8 correlation patches should sit within a few percent of fp32.
    rng = np.random.RandomState(4)
    bt, h, w, c, n = 2, 16, 12, 32, 7
    grid = rng.randn(bt, h, w, c).astype(np.float32)
    grid /= np.linalg.norm(grid, axis=-1, keepdims=True)
    query = rng.randn(bt, n, c).astype(np.float32)
    query /= np.linalg.norm(query, axis=-1, keepdims=True)
    cy = (rng.rand(bt, n) * h).astype(np.float32)
    cx = (rng.rand(bt, n) * w).astype(np.float32)
    fp = np.asarray(corr_tents._math_reference(
        jnp.asarray(grid), jnp.asarray(query), jnp.asarray(cy),
        jnp.asarray(cx), 7))
    q8 = np.asarray(corr_tents._math_reference_quantized(
        jnp.asarray(grid), jnp.asarray(query), jnp.asarray(cy),
        jnp.asarray(cx), 7))
    err = np.abs(q8 - fp).max()
    assert err < 0.05, f"int8 corr drift too large: {err}"

  def test_quantized_gradients_are_fp(self):
    args = make_inputs(seed=5, bt=1, h=8, w=8, c=4, n=3)

    def loss_q(grid, query):
      return jnp.sum(
          corr_tents.corr_tent_patches(grid, query, args[2], args[3], 5,
                                       True) ** 2
      )

    # The custom VJP routes through the fp reference regardless of the
    # quantized flag (straight-through); check it is finite and close to
    # the fp-forward gradients.
    g_q = jax.grad(loss_q, argnums=(0, 1))(args[0], args[1])
    assert all(np.isfinite(np.asarray(g)).all() for g in g_q)

  def test_per_frame_kernel_matches_reference(self, force_interpret):
    args = make_inputs(seed=6)
    out = corr_tents._pallas_forward(*args, 7, quantized="per_frame")
    ref = corr_tents._math_reference_quantized(*args, 7, per_frame=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )

  def test_per_frame_drift_vs_fp_small(self):
    rng = np.random.RandomState(8)
    bt, h, w, c, n = 2, 16, 12, 32, 7
    grid = rng.randn(bt, h, w, c).astype(np.float32)
    grid /= np.linalg.norm(grid, axis=-1, keepdims=True)
    query = rng.randn(bt, n, c).astype(np.float32)
    query /= np.linalg.norm(query, axis=-1, keepdims=True)
    cy = (rng.rand(bt, n) * h).astype(np.float32)
    cx = (rng.rand(bt, n) * w).astype(np.float32)
    fp = np.asarray(corr_tents._math_reference(
        jnp.asarray(grid), jnp.asarray(query), jnp.asarray(cy),
        jnp.asarray(cx), 7))
    q8 = np.asarray(corr_tents._math_reference_quantized(
        jnp.asarray(grid), jnp.asarray(query), jnp.asarray(cy),
        jnp.asarray(cx), 7, per_frame=True))
    err = np.abs(q8 - fp).max()
    assert err < 0.08, f"per-frame int8 corr drift too large: {err}"

  def test_prequantized_matches_inline_per_frame(self, force_interpret):
    args = make_inputs(seed=9)
    grid, query, cy, cx = args
    inline = corr_tents._pallas_forward(
        grid, query, cy, cx, 7, quantized="per_frame"
    )
    g8, fs = corr_tents.quantize_per_frame(grid)
    pre = corr_tents._pallas_forward(
        g8, query, cy, cx, 7, frame_scale=fs
    )
    np.testing.assert_allclose(
        np.asarray(pre), np.asarray(inline), rtol=1e-5, atol=1e-5
    )

  def test_prequantized_math_reference(self):
    grid, query, cy, cx = make_inputs(seed=10)
    g8, fs = corr_tents.quantize_per_frame(grid)
    pre = corr_tents.corr_tent_patches_prequantized(
        g8, fs, query, cy, cx, 7
    )
    inline = corr_tents._math_reference_quantized(
        grid, query, cy, cx, 7, per_frame=True
    )
    np.testing.assert_allclose(
        np.asarray(pre), np.asarray(inline), rtol=2e-2, atol=2e-2
    )
