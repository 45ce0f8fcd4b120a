"""Measure the fused mixer-block kernel: bf16 MLP vs w8a8 int8 MLP.

Production refinement shape: 12 sequential blocks at [128, 250, 512] bf16
(pre-padded T=256 + valid_len, like PipsMixer does).
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.ops import fused_mixer_block as fmb
from tapnet_tpu.utils import profiling

B, T, C, HID, K, MULT = 128, 250, 512, 2048, 3, 4


def make_weights(i):
  rng = np.random.RandomState(i)
  f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
  return (
      f(C) + 1.0, f(K, 1, MULT * C), f(MULT * C), f(K, 1, MULT * C),
      f(MULT * C), f(C) + 1.0, f(C, HID), f(HID), f(HID, C), f(C),
  )


def main():
  rng = np.random.RandomState(0)
  tpad = -T % 8
  if tpad < K - 1:
    tpad += 8
  x0 = jnp.asarray(
      np.pad(rng.randn(B, T, C), ((0, 0), (0, tpad), (0, 0))).astype(
          np.float32
      )
  ).astype(jnp.bfloat16)
  weights = [
      jax.tree_util.tree_map(
          lambda a: a.astype(jnp.bfloat16), make_weights(i)
      )
      for i in range(12)
  ]

  # Weights as ARGUMENTS (closure constants inline ~51 MB into the MLIR
  # and wedge the remote compile helper).
  for quantized in (False, True):
    def stack(x, weights, quantized=quantized):
      for w in weights:
        x = fmb.mixer_block(x, *w, False, T, quantized)
      return x

    stats = profiling.benchmark_stats(
        stack, x0, weights, iters_per_measure=20, num_measures=3
    )
    print(
        f"quantized={quantized}: min {stats['min']*1e3:.2f} ms  "
        f"median {stats['median']*1e3:.2f} ms  reps "
        f"{[round(r*1e3, 2) for r in stats['reps']]}",
        flush=True,
    )

  # Drift check at the production shape with bf16 IO.
  @jax.jit
  def run_f(x, weights):
    for w in weights:
      x = fmb.mixer_block(x, *w, False, T, False)
    return x

  @jax.jit
  def run_q(x, weights):
    for w in weights:
      x = fmb.mixer_block(x, *w, False, T, True)
    return x

  full = np.asarray(run_f(x0, weights)).astype(np.float32)
  q8 = np.asarray(run_q(x0, weights)).astype(np.float32)
  rel = np.abs(q8 - full) / (np.abs(full).mean() + 1e-6)
  print(f"12-block drift: mean rel {rel.mean():.4f} max rel {rel.max():.3f}")


if __name__ == "__main__":
  main()
