"""Fused mixer-block kernel tests: interpreter mode vs the unfused math,
equivalence with the Flax MixerBlock, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.ops import fused_mixer_block as fmb


@pytest.fixture
def force_interpret():
  fmb.FORCE_INTERPRET = True
  yield
  fmb.FORCE_INTERPRET = False


def make_inputs(seed=0, b=3, t=10, c=16, hid=64, k=3, mult=4):
  rng = np.random.RandomState(seed)
  f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
  return (
      f(b, t, c) * 0.5,
      f(c) * 0.2 + 1.0,          # g1
      f(k, 1, mult * c) * 0.3,   # wu
      f(mult * c) * 0.1,         # bu
      f(k, 1, mult * c) * 0.3,   # wm
      f(mult * c) * 0.1,         # bm
      f(c) * 0.2 + 1.0,          # g2
      f(c, hid) * 0.1,           # w1
      f(hid) * 0.1,              # b1
      f(hid, c) * 0.1,           # w2
      f(c) * 0.1,                # b2
  )


class TestFusedMixerBlock:

  @pytest.mark.parametrize("causal", [False, True])
  def test_kernel_matches_math(self, force_interpret, causal):
    args = make_inputs()
    out = fmb._pallas_forward(*args, causal)
    ref = fmb._math_reference(*args, causal)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

  def test_time_padding(self, force_interpret):
    # t not a multiple of the sublane count exercises the pad+mask path.
    args = make_inputs(seed=1, t=13)
    out = fmb._pallas_forward(*args, False)
    ref = fmb._math_reference(*args, False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

  def test_matches_flax_mixer_block(self):
    """The math reference equals the unfused Flax MixerBlock."""
    from tapnet_tpu.models.layers import MixerBlock

    args = make_inputs(seed=2, c=16, hid=64)
    (x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2) = args

    block = MixerBlock(kernel_size=3, causal=False)
    params = {
        "ln_temporal": {"scale": g1},
        "temporal": {
            "dw_up": {"kernel": wu, "bias": bu},
            "dw_mix": {"kernel": wm, "bias": bm},
        },
        "ln_channel": {"scale": g2},
        "fc_up": {"kernel": w1, "bias": b1},
        "fc_down": {"kernel": w2, "bias": b2},
    }
    out_flax, _ = block.apply({"params": params}, x)
    out_ref = fmb._math_reference(*args, False)
    np.testing.assert_allclose(
        np.asarray(out_flax), np.asarray(out_ref), rtol=1e-4, atol=1e-4
    )

  def test_prepadded_stack_composes(self, force_interpret):
    """Pre-padded input + valid_len across a 3-block stack equals running
    each block unpadded (the PipsMixer pad-once path)."""
    t_real = 13
    stacks = [make_inputs(seed=10 + i, t=t_real) for i in range(3)]
    x = stacks[0][0]

    # Unpadded reference: chain the math reference.
    ref = x
    for args in stacks:
      ref = fmb._math_reference(ref, *args[1:], False)

    # Padded kernel chain with valid_len.
    pad = -t_real % 8
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    out = xp
    for args in stacks:
      out = fmb._pallas_forward(out, *args[1:], False, valid_len=t_real)
    np.testing.assert_allclose(
        np.asarray(out[:, :t_real]), np.asarray(ref), rtol=5e-4, atol=5e-4
    )
    # Pad rows stay exactly zero.
    assert np.all(np.asarray(out[:, t_real:]) == 0)

  @pytest.mark.parametrize("causal", [False, True])
  def test_quantized_kernel_matches_quantized_math(
      self, force_interpret, causal
  ):
    args = make_inputs(seed=4)
    out = fmb._pallas_forward(*args, causal, quantized=True)
    ref = fmb._math_reference(*args, causal, quantized=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

  def test_quantized_close_to_full_precision(self, force_interpret):
    """w8a8 MLP drift stays small relative to the signal (sanity bound)."""
    args = make_inputs(seed=5, b=4, t=16)
    full = np.asarray(fmb._math_reference(*args, False))
    q = np.asarray(fmb._pallas_forward(*args, False, quantized=True))
    rel = np.abs(q - full) / (np.abs(full).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()
    assert rel.max() < 0.2, rel.max()

  def test_quantized_flax_block_unfused_matches_math(self):
    """MixerBlock(quantized=True) below the fused size gate uses the same
    quantized math as the kernel path."""
    from tapnet_tpu.models.layers import MixerBlock
    from tapnet_tpu.ops import mixer_math

    args = make_inputs(seed=6, c=16, hid=64)
    (x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2) = args
    params = {
        "ln_temporal": {"scale": g1},
        "temporal": {
            "dw_up": {"kernel": wu, "bias": bu},
            "dw_mix": {"kernel": wm, "bias": bm},
        },
        "ln_channel": {"scale": g2},
        "fc_up": {"kernel": w1, "bias": b1},
        "fc_down": {"kernel": w2, "bias": b2},
    }
    block = MixerBlock(kernel_size=3, causal=False, quantized=True)
    out_flax, _ = block.apply({"params": params}, x)
    ref = fmb._math_reference(*args, False, quantized=True)
    np.testing.assert_allclose(
        np.asarray(out_flax), np.asarray(ref), rtol=1e-4, atol=1e-4
    )

  def test_quantized_gradients_are_straight_through(self, force_interpret):
    args = make_inputs(seed=7)

    def loss(*a):
      return jnp.sum(fmb.mixer_block(*a, False, None, True) ** 2)

    grads = jax.grad(loss, argnums=(0, 7))(*args)
    for g in grads:
      assert np.all(np.isfinite(np.asarray(g)))
      assert np.abs(np.asarray(g)).sum() > 0

  def test_gradients_flow(self, force_interpret):
    args = make_inputs(seed=3)

    def loss(*a):
      return jnp.sum(fmb.mixer_block(*a, False) ** 2)

    grads = jax.grad(loss, argnums=tuple(range(11)))(*args)

    def ref_loss(*a):
      return jnp.sum(fmb._math_reference(*a, False) ** 2)

    ref_grads = jax.grad(ref_loss, argnums=tuple(range(11)))(*args)
    for g, r in zip(grads, ref_grads):
      np.testing.assert_allclose(
          np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4
      )
