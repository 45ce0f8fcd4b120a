"""Attribute w8a8 ExtraConvs feature error: weights vs activations vs scale
granularity.

The 0.6% catastrophic drift tail (drift_qec.py) comes from stage-1
cost-volume argmax flips caused by quantized *features*. Before designing a
fix, attribute the per-layer feature error:

  w8a8      current production scheme (per-frame act scales)
  w8-only   fp acts x int8 weights (isolates weight quantization)
  a8-only   int8 acts x fp weights (isolates activation quantization)
  w8a8-gN   per-(frame, channel-group) act scales, G groups — exact dequant
            (conv is linear in C_in, so per-group convs sum exactly)

Error metric: relative L2 and max-abs of the final feature map vs the fp
stack, plus the fraction of feature entries whose error exceeds half the
typical near-tie gap.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import layers
from tapnet_tpu.ops import qconv


def q8_math_grouped(x, kernel, bias, strides=(1, 1), groups=8):
  """w8a8 with per-(frame, C_in-group) activation scales. Exact dequant:
  conv is linear in C_in, so summing per-group int8 convs == one conv."""
  kf = kernel.astype(jnp.float32)
  w_amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
  ws = jnp.maximum(w_amax, 1e-8) * (1.0 / 127.0)
  cin = x.shape[-1]
  g = min(groups, cin)
  assert cin % g == 0
  xf = x.astype(jnp.float32)
  acc = None
  for i in range(g):
    sl = slice(i * cin // g, (i + 1) * cin // g)
    xg = xf[..., sl]
    xs = jnp.maximum(
        jnp.max(jnp.abs(xg), axis=(1, 2, 3), keepdims=True), 1e-8
    ) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xg / xs), -127.0, 127.0).astype(jnp.int8)
    wq = jnp.clip(jnp.round(kf[:, :, sl] / ws), -127.0, 127.0).astype(
        jnp.int8
    )
    part = qconv._conv(xq, wq, jnp.int32, strides).astype(jnp.float32) * (
        xs * ws
    )
    acc = part if acc is None else acc + part
  return (acc + bias.astype(jnp.float32)).astype(x.dtype)


def q8_math_w8only(x, kernel, bias, strides=(1, 1)):
  kf = kernel.astype(jnp.float32)
  w_amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
  ws = jnp.maximum(w_amax, 1e-8) * (1.0 / 127.0)
  wq = jnp.clip(jnp.round(kf / ws), -127.0, 127.0)
  y = qconv._conv(x.astype(jnp.float32), wq * ws, jnp.float32, strides)
  return (y + bias.astype(jnp.float32)).astype(x.dtype)


def q8_math_a8only(x, kernel, bias, strides=(1, 1)):
  xf = x.astype(jnp.float32)
  xs = jnp.maximum(
      jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-8
  ) * (1.0 / 127.0)
  xq = jnp.clip(jnp.round(xf / xs), -127.0, 127.0)
  y = qconv._conv(xq * xs, kernel.astype(jnp.float32), jnp.float32, strides)
  return (y + bias.astype(jnp.float32)).astype(x.dtype)


def main():
  rng = np.random.RandomState(0)
  t, h, w, c = 8, 60, 60, 256
  x = jnp.asarray(rng.randn(t, h, w, c).astype(np.float32)).astype(
      jnp.bfloat16
  )
  model_f = layers.ExtraConvs(quantized=False)
  model_q = layers.ExtraConvs(quantized=True)
  params = model_f.init(jax.random.PRNGKey(0), x)["params"]
  # conv_out is zero-init; perturb like drift_qec so the stack contributes.
  def perturb(path, v):
    name = "/".join(str(p) for p in path)
    if "conv_out" in name and v.ndim == 4:
      return v + jnp.asarray(rng.randn(*v.shape).astype(np.float32) * 0.02)
    return v

  params = jax.tree_util.tree_map_with_path(perturb, params)
  params = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)

  ref = np.asarray(model_f.apply({"params": params}, x), np.float32)
  scale = np.abs(ref).max()

  def report(tag, out):
    err = np.asarray(out, np.float32) - ref
    rel = np.linalg.norm(err) / np.linalg.norm(ref)
    print(
        f"{tag:12s} relL2 {rel:.4f}  maxabs {np.abs(err).max():.4f} "
        f"(feat scale {scale:.2f})",
        flush=True,
    )

  report("w8a8", model_q.apply({"params": params}, x))

  orig = qconv.conv2d_q8_math
  for tag, fn in [
      ("w8-only", q8_math_w8only),
      ("a8-only", q8_math_a8only),
      ("w8a8-g4", lambda *a, **k: q8_math_grouped(*a, groups=4, **k)),
      ("w8a8-g8", lambda *a, **k: q8_math_grouped(*a, groups=8, **k)),
      ("w8a8-g16", lambda *a, **k: q8_math_grouped(*a, groups=16, **k)),
  ]:
    # conv2d_q8's body late-binds the module global, so this takes effect.
    qconv.conv2d_q8_math = fn
    try:
      report(tag, model_q.apply({"params": params}, x))
    finally:
      qconv.conv2d_q8_math = orig


if __name__ == "__main__":
  main()
