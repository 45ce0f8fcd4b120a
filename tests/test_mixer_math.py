"""Production mixer math (ops/mixer_math.py): the per-lane depthwise
formulation vs a real feature-grouped convolution, the MLP block vs plain
Flax semantics, and both custom-vjp recompute backward passes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.ops import mixer_math


def make_depthwise_inputs(seed=0, b=3, t=10, c=16, k=3, mult=4):
  rng = np.random.RandomState(seed)
  return (
      jnp.asarray(rng.randn(b, t, c).astype(np.float32)),
      jnp.asarray(rng.randn(k, 1, mult * c).astype(np.float32) * 0.3),
      jnp.asarray(rng.randn(mult * c).astype(np.float32) * 0.1),
      jnp.asarray(rng.randn(k, 1, mult * c).astype(np.float32) * 0.3),
      jnp.asarray(rng.randn(mult * c).astype(np.float32) * 0.1),
  )


def make_mlp_inputs(m=40, c=32, h=64, seed=0, dtype=jnp.float32):
  rng = np.random.RandomState(seed)
  x = jnp.asarray(rng.randn(m, c).astype(np.float32), dtype)
  s = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
  w1 = jnp.asarray(rng.randn(c, h).astype(np.float32) * 0.05, dtype)
  b1 = jnp.asarray(rng.randn(h).astype(np.float32) * 0.05, dtype)
  w2 = jnp.asarray(rng.randn(h, c).astype(np.float32) * 0.05, dtype)
  b2 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05, dtype)
  return x, s, w1, b1, w2, b2


def flax_mlp_reference(x, s, w1, b1, w2, b2):
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


class TestTemporalDepthwise:

  @pytest.mark.parametrize("causal", [False, True])
  def test_matches_grouped_conv(self, causal):
    """The per-lane formulation equals a real feature-grouped convolution."""
    x, w_up, b_up, w_mix, b_mix = make_depthwise_inputs(seed=1)
    out = mixer_math.temporal_depthwise(x, w_up, b_up, w_mix, b_mix, causal)

    k, c = w_up.shape[0], x.shape[-1]
    left = k - 1 if causal else (k - 1) // 2
    right = 0 if causal else k - 1 - left
    xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    h = jax.lax.conv_general_dilated(
        xp, w_up, (1,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    ) + b_up
    h = jax.nn.gelu(h)
    hp = jnp.pad(h, ((0, 0), (left, right), (0, 0)))
    y4 = jax.lax.conv_general_dilated(
        hp, w_mix, (1,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=4 * c,
    ) + b_mix
    expected = y4.reshape(y4.shape[:-1] + (c, 4)).sum(-1)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5
    )

  def test_custom_vjp_matches_autodiff(self):
    args = make_depthwise_inputs(seed=2, b=2, t=6, c=8)

    def loss_prod(*a):
      return jnp.sum(jnp.sin(mixer_math.temporal_depthwise(*a, True)))

    def loss_plain(*a):
      return jnp.sum(jnp.sin(mixer_math.temporal_depthwise_math(*a, True)))

    g1 = jax.grad(loss_prod, argnums=tuple(range(5)))(*args)
    g2 = jax.grad(loss_plain, argnums=tuple(range(5)))(*args)
    for a, b in zip(g1, g2):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
      )


class TestMlpBlock:

  def test_matches_flax_semantics(self):
    args = make_mlp_inputs()
    out = mixer_math.mlp_block(*args)
    ref = flax_mlp_reference(*args)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )

  def test_leading_shape_preserved(self):
    args = make_mlp_inputs(m=24)
    x3 = args[0].reshape(2, 12, -1)
    out = mixer_math.mlp_block(x3, *args[1:])
    assert out.shape == x3.shape
    flat = mixer_math.mlp_block(*args)
    np.testing.assert_allclose(
        np.asarray(out).reshape(24, -1), np.asarray(flat), rtol=1e-6
    )

  def test_custom_vjp_matches_autodiff(self):
    args = make_mlp_inputs(m=40, c=32, h=64)

    def loss_prod(*a):
      return jnp.sum(mixer_math.mlp_block(*a) ** 2)

    def loss_ref(*a):
      return jnp.sum(flax_mlp_reference(*a) ** 2)

    g_f = jax.grad(loss_prod, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*args)
    for a, b in zip(g_f, g_r):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
      )


class TestMixerParamTree:

  def test_mixer_params_unchanged(self):
    """Param tree must stay checkpoint-compatible."""
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
