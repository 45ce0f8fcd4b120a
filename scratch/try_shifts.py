"""Try shift strategies for the temporal conv inside a Pallas kernel."""

import functools
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

T, C = 256, 512
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(4, T, C), jnp.bfloat16)


def kernel_f32roll(x_ref, y_ref):
  v = x_ref[0].astype(jnp.float32)
  t = v.shape[0]
  tidx = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
  acc = v
  for d in (-1, 1, -2, 2):
    r = pltpu.roll(v, (-d) % t, axis=0)
    mask = (tidx + d >= 0) & (tidx + d < t)
    acc = acc + jnp.where(mask, r, 0.0)
  y_ref[0] = acc.astype(x_ref.dtype)


def kernel_lane_roll(x_ref, y_ref):
  v = x_ref[0]  # [T, C] bf16
  t = v.shape[0]
  vt = v.T  # [C, T]
  tidx = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
  acc = vt.astype(jnp.float32)
  for d in (-1, 1, -2, 2):
    r = pltpu.roll(vt, (-d) % t, axis=1)
    mask = (tidx + d >= 0) & (tidx + d < t)
    acc = acc + jnp.where(mask, r.astype(jnp.float32), 0.0)
  y_ref[0] = acc.astype(x_ref.dtype).T


def run(kernel, name):
  try:
    f = pl.pallas_call(
        kernel,
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )
    out = jax.jit(f)(x)
    out.block_until_ready()
    # reference
    xf = np.asarray(x, np.float32)
    ref = xf.copy()
    for d in (-1, 1, -2, 2):
      sh = np.zeros_like(xf)
      if d > 0:
        sh[:, :-d] = xf[:, d:]
      else:
        sh[:, -d:] = xf[:, :d]
      ref += sh
    err = np.max(np.abs(np.asarray(out, np.float32) - ref))
    print(f"{name}: OK, max err {err:.4f}", flush=True)
  except Exception as e:
    print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


run(kernel_f32roll, "f32 sublane roll")
run(kernel_lane_roll, "transpose + lane roll")
