"""MEASURED DEAD END — fused InstanceNorm(+ReLU) single-pass Pallas kernel.

Kept in scratch/ so it is not retried. On one v5e at the 480p backbone
shapes (bf16 IO, `scratch/bench_inorm.py`, min over 2x10 jit-amortized
reps) the kernel LOSES to XLA's convert+reduce+normalize fusions:

  [250, 240, 240, 64]  : fused 30.83 ms vs XLA(norm+relu) 10.11 ms
  [250, 120, 120, 128] : fused  9.39 ms vs XLA(norm+relu)  6.34 ms

XLA already runs this at ~2x the 1-read+1-write HBM floor; the Pallas
version reaches only ~25% of HBM bandwidth — the per-frame grid step
(one [1, H*W, C] VMEM block, two fori_loop sweeps over row slabs) does
not pipeline its DMAs well, and at C=64 half the lanes idle. A win here
is worth at most ~3% end to end, so the production InstanceNorm stays
the plain jnp formulation (models/layers.py).

Original design notes follow.

InstanceNorm normalizes each frame's channels over the spatial dims
(reference semantics: hk.InstanceNorm in tapnet/models/resnet.py via
`normalization="instancenorm"`). XLA lowers the naive formulation as
separate convert+reduce passes for mean and variance plus a normalize
pass — three to four full HBM sweeps of the activation. At the TAPIR
480p backbone shapes ([250 frames, 240, 240, 64] for group 0) those
sweeps are the single largest non-matmul cost in the feature extractor
(xprof: ~0.26 s of `convert_reduce_fusion` per forward).

This kernel makes it ONE sweep: each grid step holds one frame in VMEM,
computes fp32 sum/sum-of-squares on the fly, normalizes, applies the
(optional) ReLU, and writes the result — 1 read + 1 write of HBM total,
with Pallas double-buffering the frame DMAs across grid steps.

Mosaic note: the frame is processed as a `lax.fori_loop` over fixed-size
row slabs of the flattened [H*W, C] plane, NOT as whole-plane jnp ops — a
whole [240*240, 64] block unrolls to thousands of vector registers per
elementwise op and the Mosaic compile never terminates in practice. The
slab size is a host-chosen divisor of H*W (see `_pick_slab`); planes
without a usable divisor fall back to the XLA reference.

Numerics: statistics and the normalization are computed in fp32
(single-pass E[x^2]-E[x]^2, like the other fused norms in this package);
IO stays in the input dtype. The backward pass recomputes through
`jax.vjp` of the jnp reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# Test hook: run the kernel in interpreter mode on CPU.
FORCE_INTERPRET = False

# Production gate. When False the jnp reference runs everywhere.
ENABLED = True

# Use the kernel only when one frame's plane is big enough that the saved
# HBM sweeps beat the kernel-launch overhead, and small enough to fit the
# VMEM working set (frame in input dtype + fp32 temporaries, double
# buffered).
_MIN_PLANE_ELEMENTS = 64 * 64 * 32
_MAX_PLANE_BYTES = 24 * 1024 * 1024  # fp32 working copy of one frame


def _math_reference(x, scale, offset, relu, eps):
  """Reference formulation: two-pass stats like jnp.var, fp32 throughout."""
  xf = x.astype(jnp.float32)
  mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
  var = jnp.var(xf, axis=(-3, -2), keepdims=True)
  out = (xf - mean) * jax.lax.rsqrt(var + eps) * scale.astype(
      jnp.float32
  ) + offset.astype(jnp.float32)
  if relu:
    out = jax.nn.relu(out)
  return out.astype(x.dtype)


def _pick_slab(rows: int, max_slab: int = 2048) -> int:
  """Largest divisor of `rows` that is <= max_slab and a multiple of 16
  (dynamic sublane slices of packed bf16 need 16-row alignment). Returns 0
  when none exists."""
  best = 0
  for d in range(16, max_slab + 1, 16):
    if rows % d == 0:
      best = d
  return best


def _kernel(x_ref, scale_ref, offset_ref, y_ref, *, relu, eps, inv_count,
            slab, num_slabs):
  # x_ref: [1, rows, C]; stats over rows, per lane (channel).
  c = x_ref.shape[-1]

  def stats_body(i, acc):
    s, sq = acc
    blk = x_ref[0, pl.ds(i * slab, slab), :].astype(jnp.float32)
    return s + jnp.sum(blk, axis=0), sq + jnp.sum(blk * blk, axis=0)

  zero = jnp.zeros((c,), jnp.float32)
  s, sq = jax.lax.fori_loop(0, num_slabs, stats_body, (zero, zero))
  mean = s * inv_count
  var = sq * inv_count - mean * mean
  mul = jax.lax.rsqrt(var + eps) * scale_ref[:].astype(jnp.float32)
  add = offset_ref[:].astype(jnp.float32) - mean * mul

  def write_body(i, _):
    blk = x_ref[0, pl.ds(i * slab, slab), :].astype(jnp.float32)
    out = blk * mul + add
    if relu:
      out = jnp.maximum(out, 0.0)
    y_ref[0, pl.ds(i * slab, slab), :] = out.astype(y_ref.dtype)
    return 0

  jax.lax.fori_loop(0, num_slabs, write_body, 0)


def _pallas_forward(x, scale, offset, relu, eps):
  h, w, c = x.shape[-3:]
  rows = h * w
  xr = x.reshape((-1, rows, c))
  n = xr.shape[0]
  slab = _pick_slab(rows)
  out = pl.pallas_call(
      functools.partial(
          _kernel, relu=relu, eps=eps, inv_count=1.0 / rows,
          slab=slab, num_slabs=rows // slab,
      ),
      grid=(n,),
      in_specs=[
          pl.BlockSpec((1, rows, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, rows, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=100 * 1024 * 1024,
      ),
      interpret=FORCE_INTERPRET,
  )(xr, scale, offset)
  return out.reshape(x.shape)


def wants_fused(x) -> bool:
  """True when the Pallas kernel should handle this input."""
  if not ENABLED or x.ndim < 4:
    return False
  h, w, c = x.shape[-3:]
  plane = h * w * c
  return (
      plane >= _MIN_PLANE_ELEMENTS
      and plane * 4 <= _MAX_PLANE_BYTES
      and _pick_slab(h * w) > 0
  )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def instance_norm(x, scale, offset, relu: bool = False, eps: float = 1e-5):
  """InstanceNorm over the spatial dims, optionally fused with ReLU.

  Args:
    x: [..., H, W, C]; statistics are per (..., C) over (H, W).
    scale / offset: [C] affine parameters.
    relu: apply ReLU inside the kernel (saves one HBM sweep in the
      pre-activation ResNet blocks, where norm is always followed by relu).
    eps: variance epsilon.

  Returns:
    Same shape/dtype as x.
  """
  if FORCE_INTERPRET:
    if x.ndim >= 4 and _pick_slab(x.shape[-3] * x.shape[-2]) > 0:
      return _pallas_forward(x, scale, offset, relu, eps)
    return _math_reference(x, scale, offset, relu, eps)
  if not wants_fused(x):
    return _math_reference(x, scale, offset, relu, eps)
  return jax.lax.platform_dependent(
      x, scale, offset,
      tpu=functools.partial(_pallas_forward, relu=relu, eps=eps),
      default=functools.partial(_math_reference, relu=relu, eps=eps),
  )


def _fwd(x, scale, offset, relu, eps):
  return instance_norm(x, scale, offset, relu, eps), (x, scale, offset)


def _bwd(relu, eps, res, g):
  _, vjp = jax.vjp(
      lambda *args: _math_reference(*args, relu, eps), *res
  )
  return vjp(g)


instance_norm.defvjp(_fwd, _bwd)
