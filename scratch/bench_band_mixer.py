"""Mixer-block kernel variants: move the temporal depthwise conv's shifts
off the VPU onto the MXU as banded [T, T] matmuls.

A shift-by-d with zero boundary is a banded permutation matrix; the pad-row
masking (rows >= t_real) folds into the band's columns. The added MXU work
(6 taps x [T,T]@[T,mult*C]) is ~1% of the block's MLP matmuls, while the VPU
loses all rolls/masks/selects (measured 5.2 ms of the 16.9 ms call).

Variants:
  prod    — production kernel (ops/fused_mixer_block.py)
  band3   — 3 fp32 band matmuls per conv, VPU accumulate
  bandcat — one [T, k*T] @ [k*T, mult*C] matmul per conv (taps concatenated)
"""

import functools
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tapnet_tpu.ops import fused_mixer_block as fmb
from tapnet_tpu.utils import profiling

_EPS = 1e-5


def _ln(x, g):
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
  return (xf - mu) * jax.lax.rsqrt(var + _EPS) * g.astype(jnp.float32)


def _kernel_band(
    x_ref, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, g2_ref, w1_ref, b1_ref,
    w2_ref, b2_ref, y_ref, *, k, mult, causal, t_real, cat,
):
  x = x_ref[0]
  t, c = x.shape

  xn32 = _ln(x, g1_ref[:]).astype(x.dtype).astype(jnp.float32)

  off = k - 1 if causal else (k - 1) // 2
  ti = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
  si = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
  bands = []
  for j in range(k):
    d = j - off
    bands.append(((si == ti + d) & (si < t_real)).astype(x.dtype))

  xr = jnp.concatenate([xn32] * mult, axis=-1)  # [T, mult*C] fp32

  def conv(v, w_ref, bias):
    out = jnp.zeros((t, mult * c), jnp.float32) + bias
    if cat:
      bandc = jnp.concatenate(bands, axis=-1)  # [T, k*T]
      taps = jnp.concatenate(
          [(v * w_ref[j].astype(jnp.float32)).astype(x.dtype)
           for j in range(k)], axis=0
      )  # [k*T, mult*C]
      return out + jax.lax.dot_general(
          bandc, taps, (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32,
      )
    for j in range(k):
      out = out + jax.lax.dot_general(
          bands[j], (v * w_ref[j].astype(jnp.float32)).astype(x.dtype),
          (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32,
      )
    return out

  h = conv(xr, wu_ref, bu_ref[:].astype(jnp.float32))
  hm = jax.nn.gelu(h)  # pad rows produce garbage; conv2's band kills it
  acc = conv(hm, wm_ref, 0.0)
  folded = bm_ref[:].astype(jnp.float32)
  for m in range(mult):
    folded = folded + acc[:, m * c : (m + 1) * c]
  x = x + folded.astype(x.dtype)

  xn = _ln(x, g2_ref[:]).astype(x.dtype)
  h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
  h = jax.nn.gelu(h + b1_ref[:].astype(jnp.float32)).astype(x.dtype)
  y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
  y = (y + b2_ref[:].astype(jnp.float32)).astype(x.dtype)
  tidx = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
  y_ref[0] = jnp.where(tidx < t_real, x + y, jnp.zeros_like(x))


def _kernel_nomask(
    x_ref, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, g2_ref, w1_ref, b1_ref,
    w2_ref, b2_ref, y_ref, *, k, mult, causal, t_real,
):
  """Production kernel minus the per-tap roll masks.

  Valid when t - t_real >= k - 1: the input's pad rows are exactly zero, so
  a roll's wraparound rows land on (or read from) zero pad; the one `valid`
  mask before conv2 stops pad rows from leaking gelu(bias).
  """
  x = x_ref[0]
  t, c = x.shape
  xn32 = _ln(x, g1_ref[:]).astype(x.dtype).astype(jnp.float32)
  tidx = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
  valid = tidx < t_real

  def shifted(v, d):
    if d == 0:
      return v
    return pltpu.roll(v, (-d) % t, axis=0)

  off = k - 1 if causal else (k - 1) // 2
  xr = jnp.concatenate([xn32] * mult, axis=-1)
  h = jnp.zeros((t, mult * c), jnp.float32) + bu_ref[:].astype(jnp.float32)
  for j in range(k):
    h = h + shifted(xr, j - off) * wu_ref[j].astype(jnp.float32)
  hm = jnp.where(valid, jax.nn.gelu(h), 0.0)
  acc = jnp.zeros((t, mult * c), jnp.float32)
  for j in range(k):
    acc = acc + shifted(hm, j - off) * wm_ref[j].astype(jnp.float32)
  folded = bm_ref[:].astype(jnp.float32)
  for m in range(mult):
    folded = folded + acc[:, m * c : (m + 1) * c]
  x = x + folded.astype(x.dtype)

  xn = _ln(x, g2_ref[:]).astype(x.dtype)
  h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
  h = jax.nn.gelu(h + b1_ref[:].astype(jnp.float32)).astype(x.dtype)
  y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
  y = (y + b2_ref[:].astype(jnp.float32)).astype(x.dtype)
  y_ref[0] = jnp.where(valid, x + y, jnp.zeros_like(x))


def band_forward(x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2, causal,
                 valid_len=None, cat=False, nomask=False):
  b, t_real, c = x.shape
  hid = w1.shape[1]
  k = wu.shape[0]
  mult = wu.shape[-1] // c
  if valid_len is not None:
    t_real = valid_len
  wu2 = wu.reshape(k, c, mult).transpose(0, 2, 1).reshape(k, mult * c)
  wm2 = wm.reshape(k, c, mult).transpose(0, 2, 1).reshape(k, mult * c)
  bu1 = bu.reshape(c, mult).T.reshape(mult * c)
  bm1 = bm.reshape(c, mult).sum(axis=-1)

  t_orig = x.shape[1]
  pad_t = -t_orig % 8
  if pad_t:
    x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
  t = x.shape[1]
  row = lambda i: (i, 0, 0)

  if nomask:
    kern = functools.partial(
        _kernel_nomask, k=k, mult=mult, causal=causal, t_real=t_real
    )
  else:
    kern = functools.partial(
        _kernel_band, k=k, mult=mult, causal=causal, t_real=t_real, cat=cat
    )
  out = pl.pallas_call(
      kern,
      grid=(b,),
      in_specs=[
          pl.BlockSpec((1, t, c), row, memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((k, mult * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((mult * c,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((k, mult * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((c, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((hid,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((hid, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, t, c), row, memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=100 * 1024 * 1024,
      ),
  )(x, g1, wu2, bu1, wm2, bm1, g2, w1, b1, w2, b2)
  return out[:, :t_orig] if pad_t else out


def main():
  b, t, c, mult, k, hid = 128, 250, 512, 4, 3, 2048
  causal = False
  rng = np.random.RandomState(0)
  dt = jnp.bfloat16
  x = jnp.asarray(rng.randn(b, t, c), dt) * 0.5
  g1 = jnp.asarray(rng.rand(c), dt) + 0.5
  g2 = jnp.asarray(rng.rand(c), dt) + 0.5
  wu = jnp.asarray(rng.randn(k, 1, mult * c), dt) * 0.2
  bu = jnp.asarray(rng.randn(mult * c), dt) * 0.1
  wm = jnp.asarray(rng.randn(k, 1, mult * c), dt) * 0.2
  bm = jnp.asarray(rng.randn(mult * c), dt) * 0.1
  w1 = jnp.asarray(rng.randn(c, hid), dt) * 0.05
  b1 = jnp.asarray(rng.randn(hid), dt) * 0.1
  w2 = jnp.asarray(rng.randn(hid, c), dt) * 0.05
  b2 = jnp.asarray(rng.randn(c), dt) * 0.1
  args = (x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2)
  dev = jax.devices()[0]
  args = jax.device_put(args, dev)

  def stack12(fn):
    def run(*a):
      y = a[0]
      for _ in range(12):
        y = fn(y, *a[1:], causal)
      return y
    return run

  prod = stack12(fmb._pallas_forward)
  band3 = stack12(functools.partial(band_forward, cat=False))
  bandcat = stack12(functools.partial(band_forward, cat=True))
  nomask = stack12(functools.partial(band_forward, nomask=True))

  ref = jax.jit(prod)(*args)
  for name, fn in [("band3", band3), ("bandcat", bandcat),
                   ("nomask", nomask)]:
    try:
      out = jax.jit(fn)(*args)
      err = float(
          jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
      )
      print(f"{name}: max|diff vs prod| = {err:.6f}", flush=True)
    except Exception as e:
      print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

  for name, fn in [("prod", prod), ("nomask", nomask)]:
    try:
      sec = profiling.benchmark(
          fn, *args, iters_per_measure=5, num_measures=3
      )
      print(f"{name}: {sec * 1000:.2f} ms / 12-block call", flush=True)
    except Exception as e:
      print(f"{name}: bench FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
  main()
