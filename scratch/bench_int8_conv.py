"""Does XLA lower an int8 conv to the v5e MXU at 2x the bf16 rate?

ExtraConvs (BootsTAPIR) is ~54 TFLOP of 3x3 convs running at ~135 TFLOP/s
bf16 (0.31 s of the fast 480p config). If int8 convs hit ~2x, a w8a8
ExtraConvs saves ~0.15 s end-to-end.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.utils import profiling

T, H, W = 250, 60, 60
C_IN, C_OUT = 256, 1024


def conv(x, w, dtype_out):
  return jax.lax.conv_general_dilated(
      x,
      w,
      window_strides=(1, 1),
      padding="SAME",
      dimension_numbers=("NHWC", "HWIO", "NHWC"),
      preferred_element_type=dtype_out,
  )


def main():
  rng = np.random.RandomState(0)
  x_f = rng.rand(T, H, W, C_IN).astype(np.float32) * 2 - 1
  w_f = rng.rand(3, 3, C_IN, C_OUT).astype(np.float32) * 0.1

  flops = T * H * W * 9 * C_IN * C_OUT * 2

  for name, x, w, out_dtype in [
      ("bf16", jnp.asarray(x_f, jnp.bfloat16), jnp.asarray(w_f, jnp.bfloat16),
       jnp.float32),
      ("int8", jnp.asarray((x_f * 127).astype(np.int8)),
       jnp.asarray((w_f * 127).astype(np.int8)), jnp.int32),
  ]:
    x = jax.device_put(x, jax.devices()[0])
    w = jax.device_put(w, jax.devices()[0])
    t0 = time.perf_counter()
    sec = profiling.benchmark(
        lambda x: conv(x, w, out_dtype), x, iters_per_measure=20
    )
    ms = sec * 1e3
    print(
        f"{name}: {ms:.3f} ms  {flops / ms / 1e9:.1f} TFLOP/s "
        f"(compile+bench {time.perf_counter() - t0:.1f}s)",
        flush=True,
    )

  # And the down conv (4C -> C).
  x_f2 = rng.rand(T, H, W, C_OUT).astype(np.float32)
  w_f2 = rng.rand(3, 3, C_OUT, C_IN).astype(np.float32) * 0.1
  for name, x, w, out_dtype in [
      ("bf16 down", jnp.asarray(x_f2, jnp.bfloat16),
       jnp.asarray(w_f2, jnp.bfloat16), jnp.float32),
      ("int8 down", jnp.asarray((x_f2 * 127).astype(np.int8)),
       jnp.asarray((w_f2 * 127).astype(np.int8)), jnp.int32),
  ]:
    x = jax.device_put(x, jax.devices()[0])
    w = jax.device_put(w, jax.devices()[0])
    t0 = time.perf_counter()
    sec = profiling.benchmark(
        lambda x: conv(x, w, out_dtype), x, iters_per_measure=20
    )
    ms = sec * 1e3
    print(
        f"{name}: {ms:.3f} ms  {flops / ms / 1e9:.1f} TFLOP/s "
        f"(compile+bench {time.perf_counter() - t0:.1f}s)",
        flush=True,
    )


if __name__ == "__main__":
  main()
