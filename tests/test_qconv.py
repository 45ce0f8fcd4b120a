"""w8a8 int8 convolution (ops/qconv.py) and the quantized ExtraConvs mode.

The quantized path is an inference speed mode (2x MXU rate on v5e); these
tests pin its contract: close-to-fp32 forward, exact straight-through
backward, and a parameter tree identical to the full-precision module so
released checkpoints load in either mode.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.models import layers
from tapnet_tpu.ops import qconv


def make_inputs(seed=0, n=2, h=12, w=10, cin=16, cout=24):
  rng = np.random.RandomState(seed)
  x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))
  k = jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2)
  b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
  return x, k, b


class TestConv2dQ8:

  def test_close_to_full_precision(self):
    x, k, b = make_inputs()
    ref = qconv.conv2d_fp_math(x, k, b)
    q = qconv.conv2d_q8(x, k, b)
    # int8 with per-frame/per-channel scales: ~1% of the activation range.
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(q - ref)))
    assert err < 0.03 * scale, (err, scale)

  def test_quantization_actually_engages(self):
    x, k, b = make_inputs()
    ref = qconv.conv2d_fp_math(x, k, b)
    q = qconv.conv2d_q8(x, k, b)
    assert float(jnp.max(jnp.abs(q - ref))) > 0.0

  def test_straight_through_backward_matches_fp(self):
    # The STE contract: for the SAME upstream cotangent, the quantized VJP
    # equals the full-precision VJP (it literally recomputes it). Comparing
    # grad-of-a-nonlinear-loss would instead compare different cotangents.
    x, k, b = make_inputs()
    out_q, vjp_q = jax.vjp(qconv.conv2d_q8, x, k, b)
    _, vjp_f = jax.vjp(qconv.conv2d_fp_math, x, k, b)
    rng = np.random.RandomState(3)
    g = jnp.asarray(rng.randn(*out_q.shape).astype(np.float32))
    for a, c in zip(vjp_q(g), vjp_f(g)):
      np.testing.assert_allclose(a, c, atol=1e-6, rtol=1e-6)

  def test_strided_backward_matches_fp(self):
    # Regression test for the custom_vjp fwd signature: with
    # nondiff_argnums, JAX passes the fwd rule the ORIGINAL argument order
    # (nondiff args are prepended only for bwd). A fwd written with strides
    # first silently binds kernel=bias and crashes every differentiation of
    # a strided conv2d_q8 (the r3 snapshot regression).
    x, k, b = make_inputs()
    f_q = lambda *a: qconv.conv2d_q8(*a, strides=(2, 2))
    f_f = lambda *a: qconv.conv2d_fp_math(*a, strides=(2, 2))
    out_q, vjp_q = jax.vjp(f_q, x, k, b)
    out_f, vjp_f = jax.vjp(f_f, x, k, b)
    assert out_q.shape == out_f.shape
    rng = np.random.RandomState(4)
    g = jnp.asarray(rng.randn(*out_q.shape).astype(np.float32))
    for a, c in zip(vjp_q(g), vjp_f(g)):
      np.testing.assert_allclose(a, c, atol=1e-6, rtol=1e-6)

  def test_zero_kernel_is_safe(self):
    # conv_out layers are zero-initialised; the per-channel weight-scale
    # eps guard must keep 0/0 out of the dequantization.
    x, k, b = make_inputs()
    out = qconv.conv2d_q8(x, jnp.zeros_like(k), b)
    assert bool(jnp.all(jnp.isfinite(out)))
    np.testing.assert_allclose(
        out, jnp.broadcast_to(b, out.shape), atol=1e-6
    )


class TestQuantizedExtraConvs:

  def _params_and_input(self, quantized):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 8, 8, 16).astype(np.float32))
    model = layers.ExtraConvs(num_layers=2, quantized=quantized)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x

  def test_param_tree_identical_across_modes(self):
    model_f, params_f, _ = self._params_and_input(False)
    model_q, params_q, _ = self._params_and_input(True)
    flat_f = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), params_f)
    flat_q = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), params_q)
    assert jax.tree_util.tree_structure(flat_f) == jax.tree_util.tree_structure(
        flat_q
    )
    assert flat_f == flat_q

  def test_quantized_forward_close(self):
    model_f, params, x = self._params_and_input(False)
    model_q, _, _ = self._params_and_input(True)
    # conv_out kernels are zero-init, so perturb them to exercise the
    # whole stack.
    rng = np.random.RandomState(2)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * rng.randn(*a.shape).astype(np.float32), params
    )
    ref = model_f.apply({"params": params}, x)
    q = model_q.apply({"params": params}, x)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(q - ref))) < 0.05 * scale

  def test_gradient_through_quantized_stack(self):
    # The STE keeps training usable with quantization active: gradients
    # through the full quantized stack must exist, be finite, and track the
    # full-precision gradients (not exactly — intermediate activations
    # differ slightly, so downstream cotangents do too).
    model_f, params, x = self._params_and_input(False)
    model_q, _, _ = self._params_and_input(True)
    rng = np.random.RandomState(5)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * rng.randn(*a.shape).astype(np.float32), params
    )
    loss_q = lambda p: jnp.sum(model_q.apply({"params": p}, x) ** 2)
    loss_f = lambda p: jnp.sum(model_f.apply({"params": p}, x) ** 2)
    gq = jax.grad(loss_q)(params)
    gf = jax.grad(loss_f)(params)
    leaves_q = jax.tree_util.tree_leaves(gq)
    leaves_f = jax.tree_util.tree_leaves(gf)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves_q)
    for a, c in zip(leaves_q, leaves_f):
      denom = float(jnp.max(jnp.abs(c))) + 1e-6
      assert float(jnp.max(jnp.abs(a - c))) < 0.1 * denom
