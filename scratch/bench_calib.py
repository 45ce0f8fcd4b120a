"""Calibrate raw HBM bandwidth and MXU rates on this chip."""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tapnet_tpu.utils import profiling

rng = np.random.RandomState(0)


def report(name, fn, *args, flops=None, bytes_=None, iters=20):
  t = profiling.benchmark(fn, *args, iters_per_measure=iters, num_measures=3)
  extra = ""
  if flops:
    extra += f"  {flops/t/1e12:7.1f} TFLOP/s"
  if bytes_:
    extra += f"  {bytes_/t/1e9:6.0f} GB/s"
  print(f"{name:42s} {t*1e3:9.3f} ms{extra}")
  return t


# Pure copies at increasing size (read+write, bump adds another read+write).
for mb in (32, 128, 512):
  n = mb * 1024 * 1024 // 2
  x = jnp.asarray(rng.randn(n // 128, 128), jnp.bfloat16)
  report(
      f"x+1 on {mb}MB bf16",
      lambda v: v + jnp.bfloat16(1),
      x,
      bytes_=4 * x.size * 2,  # r+w plus bump r+w
  )

# Single matmul at the mixer shape.
M, C, H = 32000, 512, 2048
x = jnp.asarray(rng.randn(M, C), jnp.bfloat16)
w1 = jnp.asarray(rng.randn(C, H) * 0.02, jnp.bfloat16)
report(
    "matmul [32000,512]@[512,2048] -> bf16",
    lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    ),
    x,
    w1,
    flops=2 * M * C * H,
)
w2 = jnp.asarray(rng.randn(H, C) * 0.02, jnp.bfloat16)
h = jnp.asarray(rng.randn(M, H), jnp.bfloat16)
report(
    "matmul [32000,2048]@[2048,512] -> bf16",
    lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    ),
    h,
    w2,
    flops=2 * M * C * H,
)

# fp32 copy for comparison.
xf = jnp.asarray(rng.randn(16 * 1024 * 1024 // 4, 128), jnp.float32)
report(
    "x+1 on 2GB-ish f32",
    lambda v: v + jnp.float32(1),
    xf,
    bytes_=4 * xf.size * 4,
)
