"""In-context mixer benchmark: 12-block PipsMixer at production shape.

Variants:
  a) current code path (layers.PipsMixer as-is)
  b) raw read-bandwidth calibration (sum of squares)
  c) matmul-only skeleton (no LN, no temporal) as the FLOP floor
  d) fused Pallas per-block kernel: LN1+temporal+residual+LN2+MLP+residual
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
from tapnet_tpu.models.layers import PipsMixer
from tapnet_tpu.utils import profiling

BN, T, CIN, C, H = 128, 250, 535, 512, 2048
NBLOCKS = 12

rng = np.random.RandomState(0)
x_in = jnp.asarray(rng.randn(BN, T, CIN) * 0.3, jnp.bfloat16)


def report(name, fn, *args, iters=10):
  t = profiling.benchmark(fn, *args, iters_per_measure=iters, num_measures=3)
  print(f"{name:46s} {t*1e3:9.3f} ms", flush=True)
  return t


# ---- a) current path
mixer = PipsMixer(output_channels=388, num_blocks=NBLOCKS)
cpu = jax.local_devices(backend="cpu")[0]
with jax.default_device(cpu):
  params = mixer.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, CIN)))["params"]
params = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), params)
params = jax.device_put(params, jax.devices()[0])


def run_mixer(x):
  out, _ = mixer.apply({"params": params}, x)
  return out


report("a) PipsMixer current", run_mixer, x_in)

# ---- b) read bandwidth: sum of squares over the equivalent bytes
big = jnp.asarray(rng.randn(BN * T, C), jnp.bfloat16)


def ssq(v):
  return jnp.sum(v.astype(jnp.float32) * v.astype(jnp.float32))

t = report("b) read 33MB (sum of squares)", ssq, big, iters=50)
print(f"   -> read BW {big.size*2/t/1e9:6.0f} GB/s")

# ---- c) matmul skeleton: in_proj + 12x(two matmuls+gelu) + out_proj
w_in = jnp.asarray(rng.randn(CIN, C) * 0.02, jnp.bfloat16)
w1s = jnp.asarray(rng.randn(NBLOCKS, C, H) * 0.02, jnp.bfloat16)
w2s = jnp.asarray(rng.randn(NBLOCKS, H, C) * 0.02, jnp.bfloat16)
w_out = jnp.asarray(rng.randn(C, 388) * 0.02, jnp.bfloat16)


def skeleton(x, w_in, w1s, w2s, w_out):
  x = x.reshape(-1, CIN)
  h = jnp.dot(x, w_in, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
  for i in range(NBLOCKS):
    m = jnp.dot(h, w1s[i], preferred_element_type=jnp.float32)
    m = jax.nn.gelu(m).astype(jnp.bfloat16)
    h = h + jnp.dot(m, w2s[i], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    )
  return jnp.dot(h, w_out, preferred_element_type=jnp.float32).astype(
      jnp.bfloat16
  )

report("c) matmul-only skeleton", skeleton, x_in, w_in, w1s, w2s, w_out)

# ---- d) fused per-block Pallas kernel (LN1 + temporal dw + res + LN2 + MLP + res)
EPS = 1e-5
K = 3
MULT = 4


def _block_kernel(x_ref, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, g2_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
  # x: [RB, T, C]. LN over C; temporal conv over T (SAME, non-causal).
  x = x_ref[:]
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, -1, keepdims=True)
  var = jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
  xn = (xf - mu) * jax.lax.rsqrt(var + EPS) * g1_ref[:].astype(jnp.float32)
  xn = xn.astype(jnp.bfloat16)  # [RB, T, C]

  # Temporal depthwise, per-lane math (mult lanes kept separate).
  wu = wu_ref[:]  # [K, C, MULT]
  wm = wm_ref[:]
  bu = bu_ref[:]  # [C, MULT]
  bm = bm_ref[:]
  rb, t, c = xn.shape

  y = jnp.zeros((rb, t, c), jnp.float32) + jnp.sum(
      bm.astype(jnp.float32), -1
  )
  pad = jnp.zeros((rb, 1, c), jnp.bfloat16)
  xp = jnp.concatenate([pad, xn, pad], axis=1)
  for m in range(MULT):
    h = jnp.zeros((rb, t, c), jnp.float32) + bu[:, m].astype(jnp.float32)
    for j in range(K):
      h = h + (xp[:, j : j + t] * wu[j, :, m]).astype(jnp.float32)
    h = jax.nn.gelu(h).astype(jnp.bfloat16)
    hp = jnp.concatenate([pad, h, pad], axis=1)
    for j in range(K):
      y = y + (hp[:, j : j + t] * wm[j, :, m]).astype(jnp.float32)
  x = x + y.astype(jnp.bfloat16)

  # Channel MLP with pre-LN, residual.
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, -1, keepdims=True)
  var = jnp.mean(xf * xf, -1, keepdims=True) - mu * mu
  xn = ((xf - mu) * jax.lax.rsqrt(var + EPS) * g2_ref[:].astype(jnp.float32)
        ).astype(jnp.bfloat16)
  xn2 = xn.reshape(rb * t, c)
  h = jnp.dot(xn2, w1_ref[:], preferred_element_type=jnp.float32)
  h = jax.nn.gelu(h + b1_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
  yy = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
  yy = (yy + b2_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
  y_ref[:] = x + yy.reshape(rb, t, c)


def fused_block(x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2, rb):
  bn, t, c = x.shape
  h = w1.shape[1]
  return pl.pallas_call(
      _block_kernel,
      grid=(bn // rb,),
      in_specs=[
          pl.BlockSpec((rb, t, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((K, c, MULT), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c, MULT), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((K, c, MULT), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c, MULT), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((c, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((h,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((h, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((rb, t, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((bn, t, c), x.dtype),
  )(x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2)


g1 = jnp.asarray(rng.rand(C), jnp.bfloat16)
g2 = jnp.asarray(rng.rand(C), jnp.bfloat16)
wu = jnp.asarray(rng.randn(K, C, MULT) * 0.2, jnp.bfloat16)
bu = jnp.asarray(rng.randn(C, MULT) * 0.01, jnp.bfloat16)
wm = jnp.asarray(rng.randn(K, C, MULT) * 0.2, jnp.bfloat16)
bm = jnp.asarray(rng.randn(C, MULT) * 0.01, jnp.bfloat16)
w1 = jnp.asarray(rng.randn(C, H) * 0.02, jnp.bfloat16)
b1 = jnp.asarray(rng.randn(H) * 0.01, jnp.bfloat16)
w2 = jnp.asarray(rng.randn(H, C) * 0.02, jnp.bfloat16)
b2 = jnp.asarray(rng.randn(C) * 0.01, jnp.bfloat16)

xb = jnp.asarray(rng.randn(BN, T, C) * 0.3, jnp.bfloat16)

for rb in (2, 4, 8):
  try:
    def full12(x, *ws):
      for _ in range(NBLOCKS):
        x = fused_block(x, *ws, rb=rb)
      return x

    report(
        f"d) fused Pallas block x12 (rb={rb})",
        full12, xb, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2,
    )
  except Exception as e:
    print(f"d) rb={rb} failed: {type(e).__name__}: {str(e)[:200]}")
