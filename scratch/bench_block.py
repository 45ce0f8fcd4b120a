"""Correctness + perf of the fused mixer block kernel."""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tapnet_tpu.ops import fused_mixer_block as fb
from tapnet_tpu.utils import profiling

rng = np.random.RandomState(0)
BN, T, C, H, K, MULT = 128, 250, 512, 2048, 3, 4

x = jnp.asarray(rng.randn(BN, T, C) * 0.3, jnp.bfloat16)
g1 = jnp.asarray(rng.rand(C), jnp.bfloat16)
g2 = jnp.asarray(rng.rand(C), jnp.bfloat16)
wu = jnp.asarray(rng.randn(K, 1, C * MULT) * 0.2, jnp.bfloat16)
bu = jnp.asarray(rng.randn(C * MULT) * 0.01, jnp.bfloat16)
wm = jnp.asarray(rng.randn(K, 1, C * MULT) * 0.2, jnp.bfloat16)
bm = jnp.asarray(rng.randn(C * MULT) * 0.01, jnp.bfloat16)
w1 = jnp.asarray(rng.randn(C, H) * 0.02, jnp.bfloat16)
b1 = jnp.asarray(rng.randn(H) * 0.01, jnp.bfloat16)
w2 = jnp.asarray(rng.randn(H, C) * 0.02, jnp.bfloat16)
b2 = jnp.asarray(rng.randn(C) * 0.01, jnp.bfloat16)
ws = (g1, wu, bu, wm, bm, g2, w1, b1, w2, b2)

for causal in (False, True):
  ref = fb._math_reference(x, *ws, causal)
  out = jax.jit(lambda *a: fb._pallas_forward(*a, causal))(x, *ws)
  d = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
  s = jnp.max(jnp.abs(ref.astype(jnp.float32)))
  print(f"causal={causal}: max|diff|={float(d):.4f} (scale {float(s):.1f})",
        flush=True)


def run12_fused(x, *ws):
  for _ in range(12):
    x = fb._pallas_forward(x, *ws, False)
  return x


def run12_ref(x, *ws):
  for _ in range(12):
    x = fb._math_reference(x, *ws, False)
  return x


t = profiling.benchmark(run12_fused, x, *ws, iters_per_measure=10)
print(f"fused pallas x12:  {t*1e3:8.3f} ms", flush=True)
t = profiling.benchmark(run12_ref, x, *ws, iters_per_measure=10)
print(f"xla reference x12: {t*1e3:8.3f} ms", flush=True)
