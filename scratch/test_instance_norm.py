"""Fused InstanceNorm kernel: interpreter mode vs the jnp reference,
module integration, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sys, os; sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import instance_norm as in_ops


@pytest.fixture
def force_interpret():
  in_ops.FORCE_INTERPRET = True
  yield
  in_ops.FORCE_INTERPRET = False


def make_inputs(seed=0, n=3, h=16, w=10, c=8):
  rng = np.random.RandomState(seed)
  x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32) * 2 + 1)
  scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
  offset = jnp.asarray(rng.randn(c).astype(np.float32) * 0.2)
  return x, scale, offset


class TestInstanceNormKernel:

  @pytest.mark.parametrize("relu", [False, True])
  def test_kernel_matches_reference(self, force_interpret, relu):
    x, scale, offset = make_inputs()
    out = in_ops._pallas_forward(x, scale, offset, relu, 1e-5)
    ref = in_ops._math_reference(x, scale, offset, relu, 1e-5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

  def test_extra_leading_dims(self, force_interpret):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 3, 8, 8, 8).astype(np.float32))
    scale = jnp.ones(8)
    offset = jnp.zeros(8)
    out = in_ops._pallas_forward(x, scale, offset, False, 1e-5)
    ref = in_ops._math_reference(x, scale, offset, False, 1e-5)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

  def test_bf16_io(self, force_interpret):
    x, scale, offset = make_inputs(seed=2)
    xb = x.astype(jnp.bfloat16)
    out = in_ops._pallas_forward(xb, scale, offset, True, 1e-5)
    ref = in_ops._math_reference(xb, scale, offset, True, 1e-5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )

  def test_module_matches_legacy_formulation(self):
    """InstanceNorm module output equals the original fp32 two-pass math."""
    from tapnet_tpu.models.layers import InstanceNorm

    x, scale, offset = make_inputs(seed=3)
    mod = InstanceNorm()
    out = mod.apply(
        {"params": {"scale": scale, "offset": offset}}, x
    )
    xf = np.asarray(x, np.float64)
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    ref = (xf - mean) / np.sqrt(var + 1e-5) * np.asarray(scale) + np.asarray(
        offset
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

  def test_gradients_match_reference(self, force_interpret):
    x, scale, offset = make_inputs(seed=4)

    def loss(x, s, o):
      return jnp.sum(in_ops.instance_norm(x, s, o, True) ** 2)

    def ref_loss(x, s, o):
      return jnp.sum(in_ops._math_reference(x, s, o, True, 1e-5) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(x, scale, offset)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(x, scale, offset)
    for a, b in zip(g, gr):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
      )
