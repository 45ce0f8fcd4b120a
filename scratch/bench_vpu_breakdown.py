"""Attribute the fused mixer kernel's VPU stage-1 cost to sub-stages.

Stage 1 alone measures 12.3 ms bf16 / 7.0 ms int8 per 12-block call at the
480p production shape (scratch/bench_pipeline_mixer.py) — above the 8.2 ms
bf16 / 4.1 ms int8 matmul floor, so the kernel is VPU-bound. This bench
builds cumulative variants of stage 1 to find where the time goes:

  io        y = x                                (pure VMEM<->HBM IO)
  ln1       + LayerNorm 1 (fp32 stats)
  conv1     + first temporal depthwise conv (fan-out to [T, 4C])
  gelu      + GELU on the [T, 4C] hidden
  convpair  + second depthwise conv + fold back to [T, C]  (= _temporal_half)
  s1        + LayerNorm 2 (+ int8 row-quantization in quantized mode)

plus one precision experiment:

  convpair_bf16  the same temporal pair with taps/GELU in bf16
                 (fp32 only for LN statistics)
"""

import functools
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tapnet_tpu.ops import fused_mixer_block as fmb
from tapnet_tpu.utils import profiling

B, T, C, HID, K, MULT = 128, 250, 512, 2048, 3, 4


def _temporal_sub(x, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, k, mult,
                  t_real, mode, low_precision):
  t, c = x.shape
  halo = t - t_real >= k - 1
  assert halo

  def shifted(arr, offset):
    if offset == 0:
      return arr
    return pltpu.roll(arr, (-offset) % arr.shape[0], axis=0)

  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
  xn32 = (xf - mu) * jax.lax.rsqrt(var + _EPS_) * g1_ref[:].astype(
      jnp.float32
  )
  tidx = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
  valid = tidx < t_real
  xn32 = jnp.where(valid, xn32, jnp.zeros_like(xn32))
  if mode == "ln1":
    return x + xn32.astype(x.dtype)

  cdt = jnp.bfloat16 if low_precision else jnp.float32
  off = (k - 1) // 2
  # Mosaic cannot lower bf16 sublane rotates: roll in fp32, cast after.
  taps = [shifted(xn32, j - off).astype(cdt) for j in range(k)]
  bu = bu_ref[:].astype(cdt)
  blocks = []
  for m in range(mult):
    hm_blk = bu[m * c : (m + 1) * c]
    for j in range(k):
      hm_blk = hm_blk + taps[j] * wu_ref[j, m * c : (m + 1) * c].astype(cdt)
    blocks.append(hm_blk)
  h = jnp.concatenate(blocks, axis=-1)
  if mode == "conv1":
    folded = h[:, :c]
    for m in range(1, mult):
      folded = folded + h[:, m * c : (m + 1) * c]
    return x + folded.astype(x.dtype)

  hm = jnp.where(valid, jax.nn.gelu(h), jnp.zeros_like(h))
  if mode == "gelu":
    folded = hm[:, :c]
    for m in range(1, mult):
      folded = folded + hm[:, m * c : (m + 1) * c]
    return x + folded.astype(x.dtype)

  acc = jnp.zeros((t, mult * c), cdt)
  for j in range(k):
    # (bf16 mode: rolls must be fp32 — Mosaic limitation — so the cast
    # round-trip is part of what the experiment measures.)
    tap = shifted(hm.astype(jnp.float32), j - off).astype(cdt)
    acc = acc + tap * wm_ref[j].astype(cdt)
  folded = bm_ref[:].astype(cdt)
  for m in range(mult):
    folded = folded + acc[:, m * c : (m + 1) * c]
  return x + folded.astype(x.dtype)


_EPS_ = 1e-5


def _kernel(x_ref, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, g2_ref, y_ref,
            *, k, mult, t_real, mode, low_precision, quantized):
  x = x_ref[0]
  if mode == "io":
    y_ref[0] = x
    return
  sub = "s1full" if mode == "s1" else mode
  x1 = _temporal_sub(
      x, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, k, mult, t_real,
      "convpair" if mode == "s1" else mode, low_precision,
  )
  if mode == "s1":
    mlp_in, xs = fmb._mlp_operand(x1, g2_ref, quantized)
    # Fold the operand back into the output so nothing is DCE'd.
    if quantized:
      x1 = x1 + (mlp_in.astype(jnp.float32) * xs).astype(x1.dtype)
    else:
      x1 = x1 + mlp_in
  y_ref[0] = x1


def forward(x, weights, mode, low_precision=False, quantized=False):
  g1, wu, bu, wm, bm, g2 = weights
  b, t, c = x.shape
  k = wu.shape[0]
  mult = wu.shape[-1] // c
  # Reshape in-jit (like the production _pallas_forward) so XLA's chosen
  # layout for the 1D bf16 vectors matches Mosaic's expectation.
  wu = wu.reshape(k, c, mult).transpose(0, 2, 1).reshape(k, mult * c)
  wm = wm.reshape(k, c, mult).transpose(0, 2, 1).reshape(k, mult * c)
  bu = bu.reshape(c, mult).T.reshape(mult * c)
  bm = bm.reshape(c, mult).sum(axis=-1)  # kernel folds mult blocks -> [C]
  row = lambda i: (i, 0, 0)
  vec = lambda i: (0,)
  out = pl.pallas_call(
      functools.partial(
          _kernel, k=k, mult=mult, t_real=T, mode=mode,
          low_precision=low_precision, quantized=quantized,
      ),
      grid=(b,),
      in_specs=[
          pl.BlockSpec((1, t, c), row, memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), vec, memory_space=pltpu.VMEM),
          pl.BlockSpec((k, mult * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((mult * c,), vec, memory_space=pltpu.VMEM),
          pl.BlockSpec((k, mult * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), vec, memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), vec, memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, t, c), row, memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=100 * 1024 * 1024,
      ),
  )(x, g1, wu, bu, wm, bm, g2)
  return out


def make_weights(i):
  rng = np.random.RandomState(i)
  f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)
  wu = f(K, 1, MULT * C).reshape(K, MULT * C)
  wm = f(K, 1, MULT * C).reshape(K, MULT * C)
  return (
      f(C) + 1.0, wu, f(MULT * C), wm, f(MULT * C), f(C) + 1.0,
  )
  # NOTE: conv-layout (c-major) weights; `forward` re-lays them out in-jit.


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
      jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                             make_weights(i))
      for i in range(12)
  ]

  cases = [
      ("io", False, False),
      ("ln1", False, False),
      ("conv1", False, False),
      ("gelu", False, False),
      ("convpair", False, False),
      ("convpair", True, False),
      ("s1", False, False),
      ("s1", False, True),
      ("s1", True, True),
  ]
  for mode, lowp, quant in cases:
    def stack(x, mode=mode, lowp=lowp, quant=quant):
      for w in weights:
        x = forward(x, w, mode, lowp, quant)
      return x

    stats = profiling.benchmark_stats(
        stack, x0, iters_per_measure=20, num_measures=3
    )
    tag = mode + ("/bf16" if lowp else "") + ("/q8" if quant else "")
    print(
        f"{tag:18s} min {stats['min']*1e3:6.2f} ms"
        f"  reps {[round(r*1e3, 2) for r in stats['reps']]}",
        flush=True,
    )


if __name__ == "__main__":
  main()
