"""Stage-split analysis of the fused mixer-block kernel.

Measures kernel variants at the 480p production shape [128, 250(pad 256), 512]:
  s1   — stage 1 only (LN1 + temporal conv + LN2 + quantize), per grid step
  s2   — stage 2 only (channel-MLP matmuls + epilogue), per grid step
  full — the production pipelined kernel (stage1(i) + stage2(i-1) per step)

If full ~= s1 + s2, the scheduler is NOT overlapping VPU and MXU work; if
full ~= max(s1, s2), overlap is perfect.
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
from tapnet_tpu.ops import mixer_math
from tapnet_tpu.utils import profiling

B, T, C, HID, K, MULT = 128, 250, 512, 2048, 3, 4


def _kernel_split(
    x_ref, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, g2_ref, w1_ref, b1_ref,
    w2_ref, b2_ref, *rest, k, mult, causal, t_real, quantized, mode,
):
  if quantized:
    s1_ref, s2_ref, y_ref, min_ref, xs_ref, xr_ref = rest
  else:
    s1_ref = s2_ref = xs_ref = None
    y_ref, min_ref, xr_ref = rest

  x = x_ref[0]
  if mode in ("full", "s2"):
    mlp_in_prev = min_ref[:]
    xs_prev = xs_ref[:] if quantized else None
    x_prev = xr_ref[:]

  if mode in ("full", "s1"):
    mlp_in, xs, x1 = fmb._stage1(
        x, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, g2_ref, k, mult, causal,
        t_real, quantized,
    )
    min_ref[:] = mlp_in
    if quantized:
      xs_ref[:] = xs
    xr_ref[:] = x1

  if mode in ("full", "s2"):
    y_ref[0] = fmb._stage2(
        mlp_in_prev, xs_prev, x_prev, w1_ref, b1_ref, w2_ref, b2_ref,
        s1_ref, s2_ref, t_real, quantized,
    )
  else:
    y_ref[0] = x1


def forward(x, weights, quantized, mode):
  g1, wu, bu, wm, bm, g2, w1, b1, w2, b2 = weights
  b, t, c = x.shape
  t_real = T
  k = wu.shape[0]
  mult = wu.shape[-1] // c
  hid = w1.shape[1]
  wu2 = wu.reshape(k, c, mult).transpose(0, 2, 1).reshape(k, mult * c)
  wm2 = wm.reshape(k, c, mult).transpose(0, 2, 1).reshape(k, mult * c)
  bu1 = bu.reshape(c, mult).T.reshape(mult * c)
  bm1 = bm.reshape(c, mult).sum(axis=-1)

  in_row = lambda i: (jnp.minimum(i, b - 1), 0, 0)
  out_row = lambda i: (jnp.maximum(i - 1, 0), 0, 0)
  operands = [x, g1, wu2, bu1, wm2, bm1, g2]
  in_specs = [
      pl.BlockSpec((1, t, c), in_row, memory_space=pltpu.VMEM),
      pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
      pl.BlockSpec((k, mult * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
      pl.BlockSpec((mult * c,), lambda i: (0,), memory_space=pltpu.VMEM),
      pl.BlockSpec((k, mult * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
      pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
      pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
  ]
  if quantized:
    w1q, s1 = mixer_math.quantize_weight_cols(w1)
    w2q, s2 = mixer_math.quantize_weight_cols(w2)
    operands += [w1q, b1, w2q, b2, s1, s2]
    in_specs += [
        pl.BlockSpec((c, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hid,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((hid, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((hid,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
  else:
    operands += [w1, b1, w2, b2]
    in_specs += [
        pl.BlockSpec((c, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hid,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((hid, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]

  scratch_shapes = [pltpu.VMEM((t, c), jnp.int8 if quantized else x.dtype)]
  if quantized:
    scratch_shapes.append(pltpu.VMEM((t, 1), jnp.float32))
  scratch_shapes.append(pltpu.VMEM((t, c), x.dtype))

  return pl.pallas_call(
      functools.partial(
          _kernel_split, k=k, mult=mult, causal=False, t_real=t_real,
          quantized=quantized, mode=mode,
      ),
      grid=(b + 1,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((1, t, c), out_row, memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
      scratch_shapes=scratch_shapes,
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=100 * 1024 * 1024,
      ),
  )(*operands)


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
      jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), make_weights(i))
      for i in range(12)
  ]

  for quantized in (False, True):
    for mode in ("s1", "s2", "full"):
      def stack(x, mode=mode, quantized=quantized):
        for w in weights:
          x = forward(x, w, quantized, mode)
        return x

      stats = profiling.benchmark_stats(
          stack, x0, iters_per_measure=20, num_measures=3
      )
      print(
          f"quantized={quantized} mode={mode}: min {stats['min']*1e3:.2f} ms"
          f"  reps {[round(r*1e3, 2) for r in stats['reps']]}",
          flush=True,
      )


if __name__ == "__main__":
  main()
