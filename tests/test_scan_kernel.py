"""Pallas linear-scan kernel tests (interpreter mode on CPU) + VJP checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.ops import scan as scan_ops


def sequential_reference(x, a, h0):
  h = np.asarray(h0, np.float64)
  ys = []
  for t in range(x.shape[1]):
    h = np.asarray(a[:, t], np.float64) * h + np.asarray(x[:, t], np.float64)
    ys.append(h.copy())
  return np.stack(ys, 1), ys[-1]


@pytest.fixture
def force_interpret():
  scan_ops.FORCE_INTERPRET = True
  yield
  scan_ops.FORCE_INTERPRET = False


class TestPallasKernel:

  @pytest.mark.parametrize(
      "shape", [(2, 8, 16), (3, 12, 130), (1, 48, 512), (9, 6, 32)]
  )
  def test_forward_matches_sequential(self, force_interpret, shape):
    b, t, c = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
    a = jnp.asarray(rng.rand(b, t, c).astype(np.float32) * 0.25 + 0.7)
    h0 = jnp.asarray(rng.randn(b, c).astype(np.float32))

    y, h_last = scan_ops.linear_scan(x, a, h0)
    ref_y, ref_h = sequential_reference(x, a, h0)
    np.testing.assert_allclose(y, ref_y, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(h_last, ref_h, rtol=1e-5, atol=1e-5)

  def test_forward_bf16_io(self, force_interpret):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 16), jnp.bfloat16)
    a = jnp.asarray(rng.rand(2, 8, 16) * 0.2 + 0.7, jnp.bfloat16)
    h0 = jnp.zeros((2, 16), jnp.float32)
    y, h_last = scan_ops.linear_scan(x, a, h0)
    assert y.dtype == jnp.bfloat16
    assert h_last.dtype == jnp.float32
    ref_y, _ = sequential_reference(
        np.asarray(x, np.float32), np.asarray(a, np.float32), h0
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), ref_y, rtol=2e-2, atol=2e-2
    )

  def test_gradients_match_xla_path(self, force_interpret):
    rng = np.random.RandomState(2)
    b, t, c = 2, 10, 24
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
    a = jnp.asarray(rng.rand(b, t, c).astype(np.float32) * 0.2 + 0.7)
    h0 = jnp.asarray(rng.randn(b, c).astype(np.float32))

    def loss_pallas(x, a, h0):
      y, h_last = scan_ops.linear_scan(x, a, h0)
      return jnp.sum(jnp.sin(y)) + jnp.sum(h_last**2)

    def loss_naive(x, a, h0):
      # Pure-JAX sequential recurrence as gradient oracle.
      def step(h, inputs):
        xt, at = inputs
        h = at * h + xt
        return h, h

      h_last, y = jax.lax.scan(
          step, h0, (x.transpose(1, 0, 2), a.transpose(1, 0, 2))
      )
      y = y.transpose(1, 0, 2)
      return jnp.sum(jnp.sin(y)) + jnp.sum(h_last**2)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, a, h0)
    g_ref = jax.grad(loss_naive, argnums=(0, 1, 2))(x, a, h0)
    for gp, gr, name in zip(g_pallas, g_ref, ["dx", "da", "dh0"]):
      np.testing.assert_allclose(
          gp, gr, rtol=1e-4, atol=1e-5, err_msg=name
      )

  def test_one_step_streaming(self):
    x = jnp.ones((1, 1, 4))
    a = jnp.full((1, 1, 4), 0.5)
    h0 = jnp.full((1, 4), 2.0)
    y, h = scan_ops.linear_scan(x, a, h0)
    np.testing.assert_allclose(y[:, 0], 2.0)
    np.testing.assert_allclose(h, 2.0)
