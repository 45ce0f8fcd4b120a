"""Stacked mixer kernel: all 12 blocks in ONE pallas_call.

Production runs 12 pallas_calls per mixer invocation: x round-trips HBM 12x
and each call re-DMAs ~4.2 MB of weights. All 12 blocks' weights (~51 MB
bf16) fit VMEM next to the activolder row block, so one kernel can run the
whole stack: x is read/written once, weights fetched once, and the per-call
op count collapses. Multi-row blocks (rb) keep the MLP matmuls fat when T is
small (256^2 inference: T=32)."""

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

_EPS = 1e-5


def _kernel(
    x_ref, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, g2_ref, w1_ref, b1_ref,
    w2_ref, b2_ref, y_ref, *, k, mult, causal, t_real, num_blocks,
):
  x = x_ref[:]  # [rb, T, C]
  rb, t, c = x.shape
  tidx = jax.lax.broadcasted_iota(jnp.int32, (rb, t, 1), 1)
  valid = tidx < t_real
  off = k - 1 if causal else (k - 1) // 2

  def shifted(v, d):
    if d == 0:
      return v
    r = pltpu.roll(v, (-d) % t, axis=1)
    mask = (tidx + d >= 0) & (tidx + d < t_real)
    return jnp.where(mask, r, jnp.zeros_like(r))

  def ln(v, g):
    vf = v.astype(jnp.float32)
    mu = jnp.mean(vf, axis=-1, keepdims=True)
    var = jnp.mean(vf * vf, axis=-1, keepdims=True) - mu * mu
    return (vf - mu) * jax.lax.rsqrt(var + _EPS) * g.astype(jnp.float32)

  for i in range(num_blocks):
    xn = ln(x, g1_ref[i]).astype(x.dtype)
    xn32 = xn.astype(jnp.float32)
    xr = jnp.concatenate([xn32] * mult, axis=-1)  # [rb, T, mult*C]
    h = jnp.zeros((rb, t, mult * c), jnp.float32) + bu_ref[i].astype(
        jnp.float32
    )
    for j in range(k):
      h = h + shifted(xr, j - off) * wu_ref[i, j].astype(jnp.float32)
    hm = jnp.where(valid, jax.nn.gelu(h), 0.0)
    acc = jnp.zeros((rb, t, mult * c), jnp.float32)
    for j in range(k):
      acc = acc + shifted(hm, j - off) * wm_ref[i, j].astype(jnp.float32)
    folded = bm_ref[i].astype(jnp.float32)
    for m in range(mult):
      folded = folded + acc[..., m * c : (m + 1) * c]
    x = x + folded.astype(x.dtype)

    xn = ln(x, g2_ref[i]).astype(x.dtype)
    h = jax.lax.dot_general(
        xn, w1_ref[i], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = jax.nn.gelu(h + b1_ref[i].astype(jnp.float32)).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[i], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (y + b2_ref[i].astype(jnp.float32)).astype(x.dtype)
    x = jnp.where(valid, x + y, jnp.zeros_like(x))

  y_ref[:] = x


def stacked_forward(x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2, causal,
                    valid_len=None, rb=1):
  """x: [B, T, C]; stacked weights with leading num_blocks axis.

  wu/wm: [L, k, mult*C] m-major flat; bu: [L, mult*C]; bm: [L, C];
  g1/g2: [L, C]; w1: [L, C, H]; b1: [L, H]; w2: [L, H, C]; b2: [L, C].
  """
  b, t_real, c = x.shape
  L, _, hid = w1.shape
  k = wu.shape[1]
  mult = wu.shape[-1] // c
  if valid_len is not None:
    t_real = valid_len
  t_orig = x.shape[1]
  pad_t = -t_orig % 8
  if pad_t:
    x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
  pad_b = -b % rb
  if pad_b:
    x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
  bp = x.shape[0]
  t = x.shape[1]

  full = lambda *dims: (lambda i: tuple(0 for _ in dims))
  out = pl.pallas_call(
      functools.partial(
          _kernel, k=k, mult=mult, causal=causal, t_real=t_real,
          num_blocks=L,
      ),
      grid=(bp // rb,),
      in_specs=[
          pl.BlockSpec((rb, t, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((L, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((L, k, mult * c), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((L, mult * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((L, k, mult * c), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((L, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((L, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((L, c, hid), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((L, hid), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((L, hid, c), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((L, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((rb, t, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((bp, t, c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=110 * 1024 * 1024,
      ),
  )(x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2)
  if pad_b:
    out = out[:b]
  return out[:, :t_orig] if pad_t else out


def make_stacked(b, t, c, mult, k, hid, L, seed=0, dt=jnp.bfloat16):
  rng = np.random.RandomState(seed)
  x = jnp.asarray(rng.randn(b, t, c), dt) * 0.5
  per_block = []
  for _ in range(L):
    per_block.append(dict(
        g1=jnp.asarray(rng.rand(c), dt) + 0.5,
        g2=jnp.asarray(rng.rand(c), dt) + 0.5,
        wu=jnp.asarray(rng.randn(k, 1, mult * c), dt) * 0.2,
        bu=jnp.asarray(rng.randn(mult * c), dt) * 0.1,
        wm=jnp.asarray(rng.randn(k, 1, mult * c), dt) * 0.2,
        bm=jnp.asarray(rng.randn(mult * c), dt) * 0.1,
        w1=jnp.asarray(rng.randn(c, hid), dt) * 0.05,
        b1=jnp.asarray(rng.randn(hid), dt) * 0.1,
        w2=jnp.asarray(rng.randn(hid, c), dt) * 0.05,
        b2=jnp.asarray(rng.randn(c), dt) * 0.1,
    ))
  return x, per_block


def reshape_stacked(per_block, c, mult, k):
  """Per-block conv weights -> kernel layout, stacked over blocks."""
  def conv_w(w):
    return w.reshape(k, c, mult).transpose(0, 2, 1).reshape(k, mult * c)
  return dict(
      g1=jnp.stack([p["g1"] for p in per_block]),
      wu=jnp.stack([conv_w(p["wu"]) for p in per_block]),
      bu=jnp.stack(
          [p["bu"].reshape(c, mult).T.reshape(mult * c) for p in per_block]
      ),
      wm=jnp.stack([conv_w(p["wm"]) for p in per_block]),
      bm=jnp.stack(
          [p["bm"].reshape(c, mult).sum(axis=-1) for p in per_block]
      ),
      g2=jnp.stack([p["g2"] for p in per_block]),
      w1=jnp.stack([p["w1"] for p in per_block]),
      b1=jnp.stack([p["b1"] for p in per_block]),
      w2=jnp.stack([p["w2"] for p in per_block]),
      b2=jnp.stack([p["b2"] for p in per_block]),
  )


def main():
  causal = False
  shapes = [(128, 250), (64, 32)]
  if len(sys.argv) == 3:
    shapes = [(int(sys.argv[1]), int(sys.argv[2]))]
  elif len(sys.argv) != 1:
    sys.exit(f"usage: {sys.argv[0]} [batch frames]")
  for (b, t) in shapes:
    c, mult, k, hid, L = 512, 4, 3, 2048, 12
    x, per_block = make_stacked(b, t, c, mult, k, hid, L)
    st = reshape_stacked(per_block, c, mult, k)
    dev = jax.devices()[0]
    x = jax.device_put(x, dev)
    st = jax.device_put(st, dev)
    pb = jax.device_put(per_block, dev)

    def prod(x, pb):
      y = x
      for p in pb:
        y = fmb._pallas_forward(
            y, p["g1"], p["wu"], p["bu"], p["wm"], p["bm"], p["g2"],
            p["w1"], p["b1"], p["w2"], p["b2"], causal,
        )
      return y

    def xla(x, pb):
      y = x
      for p in pb:
        y = fmb._math_reference(
            y, p["g1"], p["wu"], p["bu"], p["wm"], p["bm"], p["g2"],
            p["w1"], p["b1"], p["w2"], p["b2"], causal,
        )
      return y

    ref = jax.jit(prod)(x, pb)
    print(f"== shape [{b}, {t}, {c}]", flush=True)
    for rb in (1, 2, 4, 8):
      name = f"stacked rb={rb}"
      fn = lambda x, st, rb=rb: stacked_forward(
          x, st["g1"], st["wu"], st["bu"], st["wm"], st["bm"], st["g2"],
          st["w1"], st["b1"], st["w2"], st["b2"], causal, rb=rb,
      )
      try:
        out = jax.jit(fn)(x, st)
        err = float(jnp.max(jnp.abs(
            out.astype(jnp.float32) - ref.astype(jnp.float32))))
        sec = profiling.benchmark(
            fn, x, st, iters_per_measure=5, num_measures=3
        )
        print(f"{name}: {sec*1000:7.2f} ms  maxdiff {err:.5f}", flush=True)
      except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
    for name, fn in [("prod", prod), ("xla", xla)]:
      sec = profiling.benchmark(fn, x, pb, iters_per_measure=5,
                                num_measures=3)
      print(f"{name}: {sec*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
  main()
