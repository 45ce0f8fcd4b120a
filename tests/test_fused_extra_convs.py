"""Fused ExtraConvs-layer kernel tests: interpreter mode vs the jnp
reference, equivalence with the Flax ExtraConvs stack, int8 accuracy vs
the per-frame qconv scheme, and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.models import layers
from tapnet_tpu.ops import fused_extra_convs as fec
from tapnet_tpu.ops import qconv


@pytest.fixture
def force_interpret():
  fec.FORCE_INTERPRET = True
  yield
  fec.FORCE_INTERPRET = False


def make_inputs(seed=0, n=2, h=6, w=5, c=8, mult=4):
  rng = np.random.RandomState(seed)
  f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
  return (
      f(n, h, w, c) * 0.5,
      f(c) * 0.2 + 1.0,            # ln scale
      f(c) * 0.1,                  # ln bias
      f(3, 3, c, mult * c) * 0.2,  # wu
      f(mult * c) * 0.1,           # bu
      f(3, 3, mult * c, c) * 0.1,  # wo
      f(c) * 0.1,                  # bo
  )


class TestFusedExtraConvs:

  @pytest.mark.parametrize("quantized", [False, True])
  def test_kernel_matches_math(self, force_interpret, quantized):
    args = make_inputs()
    out = fec._pallas_forward(*args, quantized)
    ref = fec._math_reference(*args, quantized)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

  def test_row_padding_alignment(self, force_interpret):
    # (h+2)*(w+2) not a multiple of 8 exercises the alignment-row mask.
    args = make_inputs(seed=1, h=5, w=5)
    assert (7 * 7) % 8 != 0
    out = fec._pallas_forward(*args, False)
    ref = fec._math_reference(*args, False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

  def test_fp_math_matches_unfused_path(self):
    # The quantized=False reference must equal the production unfused
    # formulation (LN-with-bias + conv2d_fp_math + gelu + residual).
    x, g, bln, wu, bu, wo, bo = make_inputs(seed=2)
    ref = fec._math_reference(x, g, bln, wu, bu, wo, bo, False)
    t = layers._ln_with_bias(x, g, bln)
    resid = jax.nn.gelu(qconv.conv2d_fp_math(t, wu, bu))
    unfused = t + qconv.conv2d_fp_math(resid, wo, bo)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(unfused), rtol=1e-5, atol=1e-5
    )

  def test_per_pixel_scales_beat_per_frame(self):
    # The fused int8 scheme (per-pixel activation scales) must be at least
    # as accurate as the per-frame qconv scheme on inputs with spatial
    # dynamic-range variation.
    rng = np.random.RandomState(3)
    x, g, bln, wu, bu, wo, bo = make_inputs(seed=3, n=2, h=8, w=8, c=16)
    # Amplify a few pixels so per-frame amax over-scales the rest.
    spikes = (rng.rand(2, 8, 8, 1) > 0.95) * 20.0
    x = x * (1.0 + jnp.asarray(spikes.astype(np.float32)))
    t = layers._ln_with_bias(x, g, bln)
    exact = jax.nn.gelu(qconv.conv2d_fp_math(t, wu, bu))
    exact = t + qconv.conv2d_fp_math(exact, wo, bo)
    fused_q = fec._math_reference(x, g, bln, wu, bu, wo, bo, True)
    frame_q = t + qconv.conv2d_q8(
        jax.nn.gelu(qconv.conv2d_q8(t, wu, bu)), wo, bo
    )
    err_pixel = float(jnp.linalg.norm(fused_q - exact))
    err_frame = float(jnp.linalg.norm(frame_q - exact))
    assert err_pixel < err_frame

  @pytest.mark.parametrize("quantized", [False, True])
  def test_gradients_are_straight_through(self, force_interpret, quantized):
    # The backward rule is jax.vjp of the full-precision math: with the
    # SAME cotangent, the fused layer's VJP must match it exactly (the
    # int8 mode only changes the forward).
    args = make_inputs(seed=4)
    rng = np.random.RandomState(7)
    ct = jnp.asarray(rng.randn(*args[0].shape).astype(np.float32))

    _, vjp_fused = jax.vjp(
        lambda *a: fec.extra_convs_layer(*a, quantized), *args
    )
    _, vjp_ref = jax.vjp(
        lambda *a: fec._math_reference(*a, quantized=False), *args
    )
    for a, b in zip(vjp_fused(ct), vjp_ref(ct)):
      assert bool(jnp.all(jnp.isfinite(a)))
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
      )


class TestExtraConvsModule:

  def _apply(self, x, quantized=False, monkey=None):
    model = layers.ExtraConvs(num_layers=2, quantized=quantized)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    if monkey is not None:
      params = monkey(params)
    return model.apply({"params": params}, x), params

  def test_param_tree_unchanged(self):
    # The r4 refactor (param-holder modules for the fused path) must keep
    # the exact checkpoint tree of the nn.LayerNorm/_Conv3x3 formulation.
    x = jnp.zeros((2, 6, 6, 8))
    _, params = self._apply(x)
    assert sorted(params) == [
        "conv_out_0", "conv_out_1", "conv_up_0", "conv_up_1",
        "ln_0", "ln_1",
    ]
    assert sorted(params["ln_0"]) == ["bias", "scale"]
    assert sorted(params["conv_up_0"]) == ["bias", "kernel"]
    assert params["conv_up_0"]["kernel"].shape == (3, 3, 8, 32)
    assert params["conv_out_0"]["kernel"].shape == (3, 3, 32, 8)
    # conv_out zero-init, conv_up not.
    assert float(jnp.abs(params["conv_out_0"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(params["conv_up_0"]["kernel"]).max()) > 0.0

  def test_fused_module_path_matches_reference(self, force_interpret):
    # Force the per-pixel module mode through the fused gate by lowering
    # the size threshold; it must compute the per-pixel kernel scheme —
    # i.e. match a manually composed stack of fec._math_reference layers.
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 6, 6, 128).astype(np.float32) * 0.5)
    old = fec._MIN_FUSED_ELEMENTS
    fec._MIN_FUSED_ELEMENTS = 1
    try:
      out_fused, params = self._apply(x, quantized="per_pixel")
    finally:
      fec._MIN_FUSED_ELEMENTS = old
    # Perturb-free manual reference on the same params.
    ref = x
    for i in range(2):
      ref = fec._math_reference(
          ref,
          params[f"ln_{i}"]["scale"], params[f"ln_{i}"]["bias"],
          params[f"conv_up_{i}"]["kernel"], params[f"conv_up_{i}"]["bias"],
          params[f"conv_out_{i}"]["kernel"], params[f"conv_out_{i}"]["bias"],
          True,
      )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
    # Only the per-pixel mode takes the fused gate (bf16: XLA conv is near
    # the MXU floor; per-frame int8: XLA's overlapped path is faster).
    assert not fec.wants_fused(x, False)
