"""Correctness + perf of the fused corr+tents kernel at production shapes."""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tapnet_tpu.ops import corr_tents
from tapnet_tpu.utils import profiling

rng = np.random.RandomState(0)


def check(bt, h, w, c, n, p=7):
  grid = jnp.asarray(rng.randn(bt, h, w, c), jnp.bfloat16)
  query = jnp.asarray(rng.randn(bt, n, c), jnp.bfloat16)
  cy = jnp.asarray(rng.rand(bt, n) * (h + 4) - 2, jnp.float32)
  cx = jnp.asarray(rng.rand(bt, n) * (w + 4) - 2, jnp.float32)

  ref = corr_tents._math_reference(grid, query, cy, cx, p)
  out = jax.jit(
      lambda *a: corr_tents._pallas_forward(*a, p)
  )(grid, query, cy, cx)
  diff = jnp.max(jnp.abs(out - ref))
  scale = jnp.max(jnp.abs(ref))
  print(f"[{bt},{h},{w},{c}] n={n}: max|diff|={float(diff):.4f} "
        f"(scale {float(scale):.1f})", flush=True)

  t_ref = profiling.benchmark(
      lambda *a: corr_tents._math_reference(*a, p), grid, query, cy, cx,
      iters_per_measure=10)
  t_ker = profiling.benchmark(
      lambda *a: corr_tents._pallas_forward(*a, p), grid, query, cy, cx,
      iters_per_measure=10)
  print(f"  einsum: {t_ref*1e3:8.3f} ms   pallas: {t_ker*1e3:8.3f} ms  "
        f"({t_ref/t_ker:.2f}x)", flush=True)


# 480p hires level, chunk of 128 queries, 250 frames.
check(250, 120, 120, 128, 128)
# 480p lowres level.
check(250, 60, 60, 256, 128)
# pooled level.
check(250, 30, 30, 256, 128)
# 256 level hires.
check(250, 64, 64, 128, 128)
