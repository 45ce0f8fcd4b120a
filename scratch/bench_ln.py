"""Microbenchmark LN / MLP-block variants at the production mixer shape.

Shape: [32000, 512] bf16 tokens (chunk 128 queries x 250 frames), hidden 2048.
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
from tapnet_tpu.utils import profiling

M, C, H = 32000, 512, 2048
EPS = 1e-5

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(M, C), jnp.bfloat16)
scale = jnp.asarray(rng.rand(C), jnp.bfloat16)
w1 = jnp.asarray(rng.randn(C, H) * 0.02, jnp.bfloat16)
b1 = jnp.asarray(rng.randn(H) * 0.01, jnp.bfloat16)
w2 = jnp.asarray(rng.randn(H, C) * 0.02, jnp.bfloat16)
b2 = jnp.asarray(rng.randn(C) * 0.01, jnp.bfloat16)


def ln_twopass(x, scale):
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
  xn = (xf - mu) * jax.lax.rsqrt(var + EPS)
  return (xn * scale.astype(jnp.float32)).astype(x.dtype)


def ln_fast(x, scale):
  mu = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
  m2 = jnp.mean(
      x.astype(jnp.float32) * x.astype(jnp.float32),
      axis=-1,
      keepdims=True,
      dtype=jnp.float32,
  )
  var = m2 - mu * mu
  inv = jax.lax.rsqrt(var + EPS)
  xn = (x.astype(jnp.float32) - mu) * inv
  return (xn * scale.astype(jnp.float32)).astype(x.dtype)


def mlp_unfused(x, scale, w1, b1, w2, b2, ln):
  xn = ln(x, scale)
  h = jnp.dot(xn, w1, preferred_element_type=jnp.float32)
  h = jax.nn.gelu(h + b1.astype(jnp.float32)).astype(x.dtype)
  y = jnp.dot(h, w2, preferred_element_type=jnp.float32)
  return x + (y + b2.astype(jnp.float32)).astype(x.dtype)


def _fused_kernel(x_ref, s_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
  x = x_ref[:]
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
  xn = ((xf - mu) * jax.lax.rsqrt(var + EPS) * s_ref[:].astype(jnp.float32)
        ).astype(x.dtype)
  h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
  h = jax.nn.gelu(h + b1_ref[:].astype(jnp.float32)).astype(x.dtype)
  y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
  y_ref[:] = x + (y + b2_ref[:].astype(jnp.float32)).astype(x.dtype)


def mlp_pallas(x, scale, w1, b1, w2, b2, tile_m):
  m, c = x.shape
  hid = w1.shape[1]
  pad = -m % tile_m
  if pad:
    x = jnp.pad(x, ((0, pad), (0, 0)))
  mp = x.shape[0]
  y = pl.pallas_call(
      _fused_kernel,
      grid=(mp // tile_m,),
      in_specs=[
          pl.BlockSpec((tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((c, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((hid,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((hid, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec(
          (tile_m, c), lambda i: (i, 0), memory_space=pltpu.VMEM
      ),
      out_shape=jax.ShapeDtypeStruct((mp, c), x.dtype),
  )(x, scale, w1, b1, w2, b2)
  return y[:m] if pad else y


def report(name, fn, *args):
  t = profiling.benchmark(fn, *args, iters_per_measure=20, num_measures=3)
  print(f"{name:40s} {t*1e3:8.3f} ms")
  return t


# Correctness cross-check first.
ref = mlp_unfused(x, scale, w1, b1, w2, b2, ln_twopass)
for name, out in [
    ("fast-var", mlp_unfused(x, scale, w1, b1, w2, b2, ln_fast)),
    ("pallas512", mlp_pallas(x, scale, w1, b1, w2, b2, 512)),
    ("pallas1024", mlp_pallas(x, scale, w1, b1, w2, b2, 1024)),

]:
  diff = jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
  print(f"max|diff| {name}: {float(diff):.5f}")

report("ln_twopass alone", ln_twopass, x, scale)
report("ln_fast alone", ln_fast, x, scale)
report("mlp_unfused + ln_twopass", lambda *a: mlp_unfused(*a, ln_twopass),
       x, scale, w1, b1, w2, b2)
report("mlp_unfused + ln_fast", lambda *a: mlp_unfused(*a, ln_fast),
       x, scale, w1, b1, w2, b2)
report("mlp_pallas tile 512", lambda *a: mlp_pallas(*a, 512),
       x, scale, w1, b1, w2, b2)
report("mlp_pallas tile 1024", lambda *a: mlp_pallas(*a, 1024),
       x, scale, w1, b1, w2, b2)

def copy_op(x):
  return x + jnp.bfloat16(1.0)

def matmul_only(x, w1, b1, w2, b2):
  h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
  h = jax.nn.gelu(h + b1.astype(jnp.float32)).astype(x.dtype)
  y = jnp.dot(h, w2, preferred_element_type=jnp.float32)
  return x + (y + b2.astype(jnp.float32)).astype(x.dtype)

def big_matmul(a, b):
  return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

t = report("copy 33MB (x+1)", copy_op, x)
print(f"  -> effective BW {2*x.size*2/t/1e9:.0f} GB/s")
t = report("mlp matmuls only (no LN)", matmul_only, x, w1, b1, w2, b2)
print(f"  -> MXU {4*M*C*H/t/1e12:.1f} TFLOP/s")
a = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)
b = jnp.asarray(rng.randn(8192, 8192), jnp.bfloat16)
t = report("8k x 8k x 8k matmul", big_matmul, a, b)
print(f"  -> MXU {2*8192**3/t/1e12:.1f} TFLOP/s")
