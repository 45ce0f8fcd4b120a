"""Fused depthwise-mixer kernel tests: interpreter-mode vs math reference,
gradients, and equivalence with the unfused layer path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pallas_depthwise_mixer as depthwise_mixer


@pytest.fixture
def force_interpret():
  depthwise_mixer.FORCE_INTERPRET = True
  yield
  depthwise_mixer.FORCE_INTERPRET = False


def make_inputs(seed=0, b=3, t=10, c=16, k=3, mult=4):
  rng = np.random.RandomState(seed)
  return (
      jnp.asarray(rng.randn(b, t, c).astype(np.float32)),
      jnp.asarray(rng.randn(k, 1, mult * c).astype(np.float32) * 0.3),
      jnp.asarray(rng.randn(mult * c).astype(np.float32) * 0.1),
      jnp.asarray(rng.randn(k, 1, mult * c).astype(np.float32) * 0.3),
      jnp.asarray(rng.randn(mult * c).astype(np.float32) * 0.1),
  )


class TestFusedKernel:

  @pytest.mark.parametrize("causal", [False, True])
  def test_kernel_matches_math(self, force_interpret, causal):
    args = make_inputs()
    fused = depthwise_mixer._pallas_forward(*args, causal)
    ref = depthwise_mixer._math_reference(*args, causal)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5
    )

  def test_math_matches_grouped_conv(self):
    """The per-lane formulation equals a real feature-grouped convolution."""
    x, w_up, b_up, w_mix, b_mix = make_inputs(seed=1)
    ref = depthwise_mixer._math_reference(
        x, w_up, b_up, w_mix, b_mix, causal=True
    )

    k, c = w_up.shape[0], x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    h = jax.lax.conv_general_dilated(
        xp, w_up, (1,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    ) + b_up
    h = jax.nn.gelu(h)
    hp = jnp.pad(h, ((0, 0), (k - 1, 0), (0, 0)))
    y4 = jax.lax.conv_general_dilated(
        hp, w_mix, (1,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=4 * c,
    ) + b_mix
    expected = y4.reshape(y4.shape[:-1] + (c, 4)).sum(-1)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(expected), rtol=1e-5, atol=1e-5
    )

  def test_gradients(self, force_interpret):
    args = make_inputs(seed=2, b=2, t=6, c=8)

    def loss_fused(*a):
      return jnp.sum(jnp.sin(depthwise_mixer.temporal_depthwise(*a, True)))

    def loss_math(*a):
      return jnp.sum(jnp.sin(depthwise_mixer._math_reference(*a, True)))

    g1 = jax.grad(loss_fused, argnums=tuple(range(5)))(*args)
    g2 = jax.grad(loss_math, argnums=tuple(range(5)))(*args)
    for a, b in zip(g1, g2):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
      )

  def test_padded_channels(self, force_interpret):
    # c not a multiple of 128 exercises the padding path.
    args = make_inputs(seed=3, c=24, t=9)
    fused = depthwise_mixer._pallas_forward(*args, False)
    ref = depthwise_mixer._math_reference(*args, False)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
