import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


