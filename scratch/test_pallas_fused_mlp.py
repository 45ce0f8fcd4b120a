"""Fused LN+MLP+residual kernel: parity with the unfused Flax path and
gradients; interpreter mode exercises the Pallas kernel on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pallas_fused_mlp as fused_mlp


def make(m=100, c=64, h=256, seed=0, dtype=jnp.float32):
  rng = np.random.RandomState(seed)
  x = jnp.asarray(rng.randn(m, c).astype(np.float32), dtype)
  s = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
  w1 = jnp.asarray(rng.randn(c, h).astype(np.float32) * 0.05, dtype)
  b1 = jnp.asarray(rng.randn(h).astype(np.float32) * 0.05, dtype)
  w2 = jnp.asarray(rng.randn(h, c).astype(np.float32) * 0.05, dtype)
  b2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05, dtype)
  return x, s, w1, b1, w2, b2


def flax_reference(x, s, w1, b1, w2, b2):
  import flax.linen as nn

  xf = x.astype(jnp.float32)
  mu = xf.mean(-1, keepdims=True)
  var = ((xf - mu) ** 2).mean(-1, keepdims=True)
  xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * s).astype(x.dtype)
  h = jax.nn.gelu(
      jnp.dot(xn, w1, preferred_element_type=jnp.float32)
      + b1.astype(jnp.float32)
  ).astype(x.dtype)
  y = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.astype(
      jnp.float32
  )
  return x + y.astype(x.dtype)


class TestFusedMlp:

  def test_math_matches_flax_semantics(self):
    args = make()
    out = fused_mlp._math_reference(*args)
    ref = flax_reference(*args)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )

  def test_kernel_interpret_matches_math(self, monkeypatch):
    monkeypatch.setattr(fused_mlp, "FORCE_INTERPRET", True)
    args = make(m=67)  # ragged: exercises the pad/slice path
    out = fused_mlp.mlp_block(*args)
    ref = fused_mlp._math_reference(*args)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

  def test_leading_shape_preserved(self):
    args = make(m=24)
    x3 = args[0].reshape(2, 12, -1)
    out = fused_mlp.mlp_block(x3, *args[1:])
    assert out.shape == x3.shape
    flat = fused_mlp.mlp_block(*args)
    np.testing.assert_allclose(
        np.asarray(out).reshape(24, -1), np.asarray(flat), rtol=1e-6
    )

  def test_gradients_match_reference(self):
    args = make(m=40, c=32, h=64)

    def loss_fused(*a):
      return jnp.sum(fused_mlp.mlp_block(*a) ** 2)

    def loss_ref(*a):
      return jnp.sum(flax_reference(*a) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b in zip(g_f, g_r):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
      )


class TestMixerUsesKernel:

  def test_mixer_params_unchanged(self):
    """Param tree must stay checkpoint-compatible after the fusion."""
    from tapnet_tpu.models import layers as layers_lib

    mixer = layers_lib.PipsMixer(output_channels=8, hidden_dim=16,
                                 num_blocks=2)
    x = jnp.zeros((2, 6, 12))
    params = mixer.init(jax.random.PRNGKey(0), x)["params"]
    blk = params["block_0"]
    assert set(blk.keys()) >= {
        "ln_temporal", "temporal", "ln_channel", "fc_up", "fc_down"
    }
    assert blk["ln_channel"]["scale"].shape == (16,)
    assert blk["fc_up"]["kernel"].shape == (16, 64)
    assert blk["fc_up"]["bias"].shape == (64,)
    assert blk["fc_down"]["kernel"].shape == (64, 16)
