"""Fused ExtraConvs layer vs the unfused XLA path at the 480p shape.

[250, 60, 60, 256] bf16, 5-layer stack (the BootsTAPIR ExtraConvs at the
north-star workload). Floors: bf16 ~43 ms/layer MXU, int8 ~22 ms/layer.
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import layers
from tapnet_tpu.ops import fused_extra_convs as fec
from tapnet_tpu.ops import qconv
from tapnet_tpu.utils import profiling

N, H, W, C, MULT = 250, 60, 60, 256, 4


def make_args(seed=0):
  rng = np.random.RandomState(seed)
  f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
  return (
      f(C) * 0.2 + 1.0,
      f(C) * 0.1,
      f(3, 3, C, MULT * C) * 0.05,
      f(MULT * C) * 0.1,
      f(3, 3, MULT * C, C) * 0.02,
      f(C) * 0.1,
  )


def main():
  rng = np.random.RandomState(42)
  x = jnp.asarray(
      rng.randn(N, H, W, C).astype(np.float32) * 0.5
  ).astype(jnp.bfloat16)
  weights = [
      jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), make_args(i))
      for i in range(5)
  ]

  # Weights as ARGUMENTS: closure constants inline ~47 MB of literals into
  # the MLIR and made remote Mosaic compiles pathologically slow
  # (PERFORMANCE.md "params are jit arguments, never closures").
  def stack_fused(x, weights, quantized):
    for wset in weights:
      x = fec.extra_convs_layer(x, *wset, quantized)
    return x

  def stack_unfused(x, weights, quantized):
    conv = qconv.conv2d_q8 if quantized else qconv.conv2d_fp_math
    for g, bln, wu, bu, wo, bo in weights:
      t = layers._ln_with_bias(x, g, bln)
      r = jax.nn.gelu(conv(t, wu, bu))
      x = t + conv(r, wo, bo)
    return x

  cases = [
      ("unfused/int8", stack_unfused, True),
      ("fused/int8", stack_fused, True),
      ("unfused/bf16", stack_unfused, False),
      ("fused/bf16", stack_fused, False),
  ]
  if "--int8-only" in sys.argv:
    cases = cases[:2]
  for tag, fn, q in cases:
    stats = profiling.benchmark_stats(
        lambda v, w, fn=fn, q=q: fn(v, w, q), x, weights,
        iters_per_measure=4, num_measures=3,
    )
    print(
        f"{tag:14s} min {stats['min']*1e3:7.2f} ms  "
        f"reps {[round(r*1e3, 2) for r in stats['reps']]}",
        flush=True,
    )

  # Numerics check on device (fused vs unfused bf16).
  if "--int8-only" not in sys.argv:
    a = np.asarray(stack_fused(x, weights, False), np.float32)
    b = np.asarray(stack_unfused(x, weights, False), np.float32)
    scale = np.abs(b).max()
    print(f"bf16 fused-vs-unfused maxabs {np.abs(a-b).max():.4f} "
          f"(scale {scale:.1f})", flush=True)


if __name__ == "__main__":
  main()
