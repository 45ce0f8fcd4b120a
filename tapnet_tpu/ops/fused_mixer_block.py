"""One PIPs-mixer block as a single fused Pallas TPU kernel.

A mixer block (reference: tapnet/models/tapir_model.py:101-124) is
    x += temporal_depthwise(LN(x));  x += MLP(LN(x))
At the production refinement shape ([B*N=128 trajectories, T=250, C=512])
the two LayerNorms, the depthwise temporal conv, and the 4x-wide MLP hidden
activation are all HBM-bandwidth-bound between the two MXU matmuls: measured
on v5e, the XLA path spends ~21 ms per 12-block mixer call while a
matmul-only skeleton of the same shapes takes ~12 ms — 45% of the time is
elementwise/normalization traffic.

This kernel processes one trajectory row [T, C] per grid step, keeping
everything (LN statistics, the 4x temporal lanes, the 2048-wide MLP hidden)
in VMEM: HBM traffic per block drops to one read + one write of x plus the
(resident) weights. Temporal shifts are lane-masked `pltpu.roll`s along the
sublane (time) axis — Mosaic cannot lower pad+concat along time.

Numerics: LN statistics and all accumulations in fp32; matmuls accumulate
fp32 on the MXU; IO and MXU operands in the input dtype (bf16 in
production); GELU is the tanh approximation, as everywhere else (reference
parity: tapnet/torch/nets.py:59).

Backward recomputes through `jax.vjp` of the jnp reference, like the other
fused ops in this package.

Register-pressure note: a first formulation unrolled the mult x k
temporal-conv taps over separate [T, C] fp32 lanes; Mosaic kept every
unrolled intermediate live and the register allocator generated ~192 MB of
spill slots at T=64 (vs 128 MB physical VMEM on v5e). The current kernel
instead widens the hidden to one [T, mult*C] tensor (4 channel-blocks on the
lane axis), so only the k=3 taps are unrolled and the live set is a handful
of <=2 MB tensors; the mult fold-back is lane-aligned block slices, not a
reshape-reduce.
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

# Production gate. When False, mixer_block still works (it runs the
# XLA-fused reference formulation on every backend).
ENABLED = True

# Use the kernel only when the trajectory tensor is big enough that its
# HBM traffic dominates the (re-)DMA of the ~4 MB resident MLP weights per
# block invocation; below this XLA wins (measured: [64, 32, 512] bf16 at
# 256^2/32-frame inference is ~3% faster unfused, [128, 250, 512] at 480p
# is ~20% faster fused).
_MIN_FUSED_ELEMENTS = 8 * 1024 * 1024


def wants_fused(x) -> bool:
  """True when `mixer_block` would beat the XLA path for this input."""
  return bool(ENABLED) and x.ndim == 3 and x.size >= _MIN_FUSED_ELEMENTS

_EPS = 1e-5


def _fast_ln(x, scale):
  """Scale-only LayerNorm, fp32 single-pass statistics (E[x^2] - E[x]^2)."""
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
  xn = (xf - mu) * jax.lax.rsqrt(var + _EPS)
  return (xn * scale.astype(jnp.float32)).astype(x.dtype)


def _math_reference(x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2, causal,
                    valid_len=None, quantized=False):
  """Unfused formulation of the full block. x: [B, T, C].

  With `valid_len`, rows >= valid_len are treated as padding: they are
  ignored on input and exactly zero on output (matching the kernel, so
  pre-padded inputs compose across a block stack).
  """
  from tapnet_tpu.ops import mixer_math

  t_full = x.shape[1]
  if valid_len is not None and valid_len != t_full:
    x = x[:, :valid_len]
  h = _fast_ln(x, g1)
  h = mixer_math.temporal_depthwise_math(h, wu, bu, wm, bm, causal)
  x = x + h
  b, t, c = x.shape
  if quantized:
    w1q, s1 = mixer_math.quantize_weight_cols(w1)
    w2q, s2 = mixer_math.quantize_weight_cols(w2)
    y = mixer_math.mlp_math_q8(
        x.reshape(b * t, c), g2, w1q, s1, b1, w2q, s2, b2
    ).reshape(b, t, c)
  else:
    y = mixer_math.mlp_math(
        x.reshape(b * t, c), g2, w1, b1, w2, b2
    ).reshape(b, t, c)
  if t != t_full:
    y = jnp.pad(y, ((0, 0), (0, t_full - t), (0, 0)))
  return y


def _qrows(v):
  """Symmetric per-row int8 quantization (same formulas as mixer_math)."""
  amax = jnp.maximum(jnp.max(jnp.abs(v), axis=-1, keepdims=True), 1e-8)
  q = jnp.clip(jnp.round(v * (127.0 / amax)), -127.0, 127.0)
  return q.astype(jnp.int8), amax * (1.0 / 127.0)


def _temporal_half(x, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, k, mult,
                   causal, t_real):
  """VPU: LN1 -> temporal depthwise pair -> residual. Returns x + dwconv."""
  t, c = x.shape
  # With >= k-1 trailing zero rows (guaranteed by _pallas_forward), the
  # per-tap boundary masks are unnecessary: in-range shifted reads land on
  # exact zeros (LN keeps pad rows zero), and circular-roll wraparound only
  # corrupts rows >= t_real, which the single post-GELU mask (and the final
  # output mask) zero anyway. Dropping the 2k compare/select chains halves
  # the kernel's VPU temporal-conv time.
  halo = (t - t_real) >= (k - 1)

  # ---- LN 1 (fp32 stats). Zero rows normalize to zero, so padding stays
  # exactly zero through LN.
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
  xn32 = (xf - mu) * jax.lax.rsqrt(var + _EPS) * g1_ref[:].astype(jnp.float32)
  tidx = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
  valid = tidx < t_real
  if halo:
    # The halo path READS pad rows (instead of masking every shifted read),
    # so they must be exact zeros even if the caller left garbage there:
    # one [T, C] select replaces 2k [T, mult*C] select chains.
    xn32 = jnp.where(valid, xn32, jnp.zeros_like(xn32))

  # ---- Temporal depthwise conv -> GELU -> depthwise conv; the mult
  # hidden lanes live as ONE [T, mult*C] tensor (mult channel-blocks along
  # lanes), so only the k taps are unrolled. Shifted reads v[tau + d] with
  # zero boundary are fp32 sublane rotates (+ boundary masks when no halo
  # rows exist — Mosaic can lower neither pad+concat along time nor bf16
  # sublane rotates).
  def shifted(v, d):  # v fp32 [T, ...]
    if d == 0:
      return v
    r = pltpu.roll(v, (-d) % t, axis=0)
    if halo:
      return r
    mask = (tidx + d >= 0) & (tidx + d < t_real)
    return jnp.where(mask, r, jnp.zeros_like(r))

  off = k - 1 if causal else (k - 1) // 2
  # Weights come in m-major flat layout [k, mult*C] / [mult*C] (see
  # _pallas_forward). The first conv's input is xn tiled mult times along
  # lanes — shift the [T, C] input once per tap and fan each shifted read
  # out to the mult channel blocks (k rolls of C lanes instead of mult*C).
  taps = [shifted(xn32, j - off) for j in range(k)]
  bu = bu_ref[:].astype(jnp.float32)
  blocks = []
  for m in range(mult):
    hm_blk = bu[m * c : (m + 1) * c]
    for j in range(k):
      hm_blk = hm_blk + taps[j] * wu_ref[j, m * c : (m + 1) * c].astype(
          jnp.float32
      )
    blocks.append(hm_blk)
  h = jnp.concatenate(blocks, axis=-1)  # [T, mult*C]
  # Mask so padded rows don't leak gelu(bias) — or, on the halo path,
  # roll-wraparound garbage — into real rows via the second conv's shifts.
  hm = jnp.where(valid, jax.nn.gelu(h), 0.0)
  acc = jnp.zeros((t, mult * c), jnp.float32)
  for j in range(k):
    acc = acc + shifted(hm, j - off) * wm_ref[j].astype(jnp.float32)
  # Fold the mult channel-blocks back to [T, C] with lane-aligned slices.
  folded = bm_ref[:].astype(jnp.float32)
  for m in range(mult):
    folded = folded + acc[:, m * c : (m + 1) * c]
  return x + folded.astype(x.dtype)


def _mlp_operand(x, g2_ref, quantized):
  """VPU: LN 2 (+ activation quantization on the int8 path).

  Returns (mlp_input, act_scale_or_None): the channel-MLP operand (int8
  when quantized, x.dtype otherwise) and its per-row activation scale.
  """
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
  xn32 = (xf - mu) * jax.lax.rsqrt(var + _EPS) * g2_ref[:].astype(jnp.float32)
  if quantized:
    return _qrows(xn32)
  return xn32.astype(x.dtype), None


def _stage1(x, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, g2_ref, k, mult,
            causal, t_real, quantized):
  """VPU stage: LN1 -> temporal depthwise pair -> residual -> LN2 (+quant)."""
  x1 = _temporal_half(
      x, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, k, mult, causal, t_real
  )
  mlp_in, xs = _mlp_operand(x1, g2_ref, quantized)
  return mlp_in, xs, x1


def _mlp_hidden(acc_or_h, xs, b1_ref, s1_ref, out_dtype, quantized):
  """VPU middle of the MLP: dequant + bias + GELU (+ re-quantization)."""
  if quantized:
    h = acc_or_h.astype(jnp.float32) * (xs * s1_ref[:]) + b1_ref[:].astype(
        jnp.float32
    )
    return _qrows(jax.nn.gelu(h))
  h = jax.nn.gelu(
      acc_or_h + b1_ref[:].astype(jnp.float32)
  ).astype(out_dtype)
  return h, None


def _mlp_epilogue(acc2, hs, x, b2_ref, s2_ref, t_real, quantized):
  """VPU tail: dequant + bias + residual add + output padding mask."""
  t = x.shape[0]
  if quantized:
    y = acc2.astype(jnp.float32) * (hs * s2_ref[:]) + b2_ref[:].astype(
        jnp.float32
    )
  else:
    y = acc2 + b2_ref[:].astype(jnp.float32)
  y = y.astype(x.dtype)
  tidx = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
  # Keep padding rows exactly zero so pre-padded inputs compose across a
  # block stack (the stack pads T once instead of per block).
  return jnp.where(tidx < t_real, x + y, jnp.zeros_like(x))


def _stage2(mlp_in, xs, x, w1_ref, b1_ref, w2_ref, b2_ref, s1_ref, s2_ref,
            t_real, quantized):
  """MXU stage: channel MLP (+ residual add, + output padding mask).

  w8a8 path: symmetric per-row dynamic activation scales, per-column weight
  scales (computed outside the kernel), int32 MXU accumulation. Same
  formulas as mixer_math.mlp_math_q8.
  """
  acc_dtype = jnp.int32 if quantized else jnp.float32
  acc = jnp.dot(mlp_in, w1_ref[:], preferred_element_type=acc_dtype)
  hq, hs = _mlp_hidden(acc, xs, b1_ref, s1_ref, x.dtype, quantized)
  acc2 = jnp.dot(hq, w2_ref[:], preferred_element_type=acc_dtype)
  return _mlp_epilogue(acc2, hs, x, b2_ref, s2_ref, t_real, quantized)


def _kernel(
    x_ref, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, g2_ref, w1_ref, b1_ref,
    w2_ref, b2_ref, *rest, k, mult, causal, t_real, quantized=False,
):
  """Software-pipelined body: grid runs B+1 steps; step i does the
  VPU-heavy stage 1 for row i and the MXU-heavy channel MLP for row i-1
  (whose stage-1 products wait in VMEM scratch). The two halves are
  independent straight-line code with the matmuls issued textually ahead
  of independent VPU work, giving Mosaic's scheduler the chance to
  overlap them. Measured win is real but modest — 15.4 -> 14.9 ms (bf16)
  and 12.9 -> 12.7 ms (int8) per 12-block call at the 480p production
  shape [128, 250(pad 256), 512] (scratch/bench_q8_mixer.py) — the
  kernel remains VPU-bound (stage 1 alone is 12.3 ms bf16 / 7.0 ms int8,
  scratch/bench_pipeline_mixer.py), so the big lever is shrinking the
  VPU stage, not reordering it.

  Scratch reads precede scratch writes textually, so one buffer suffices:
  the anti-dependency keeps loads ahead of this step's stores without
  serializing the compute chains.
  """
  if quantized:
    # int8 path carries two extra per-column weight-scale operands.
    s1_ref, s2_ref, y_ref, min_ref, xs_ref, xr_ref = rest
  else:
    s1_ref = s2_ref = xs_ref = None
    y_ref, min_ref, xr_ref = rest

  # Stage-2 operands produced by the previous grid step (garbage at i=0;
  # that step's output block is overwritten at i=1 before copy-out).
  mlp_in_prev = min_ref[:]
  xs_prev = xs_ref[:] if quantized else None
  x_prev = xr_ref[:]
  acc_dtype = jnp.int32 if quantized else jnp.float32

  # MXU: first matmul for row i-1 — issued before the VPU block below so
  # the in-order schedule has it in flight while the VPU works.
  acc1 = jnp.dot(mlp_in_prev, w1_ref[:], preferred_element_type=acc_dtype)

  # VPU: LN1 + temporal depthwise pair + residual for row i.
  x = x_ref[0]  # [T_pad, C]; rows >= t_real are zero padding.
  x1 = _temporal_half(
      x, g1_ref, wu_ref, bu_ref, wm_ref, bm_ref, k, mult, causal, t_real
  )

  # VPU (consumes acc1): dequant + GELU (+ re-quantization) for row i-1,
  # then MXU: second matmul — again issued ahead of independent VPU work.
  hq, hs = _mlp_hidden(acc1, xs_prev, b1_ref, s1_ref, x.dtype, quantized)
  acc2 = jnp.dot(hq, w2_ref[:], preferred_element_type=acc_dtype)

  # VPU: LN2 (+ quantize) for row i; park stage-1 products in scratch.
  mlp_in, xs = _mlp_operand(x1, g2_ref, quantized)
  min_ref[:] = mlp_in
  if quantized:
    xs_ref[:] = xs
  xr_ref[:] = x1

  # VPU tail (consumes acc2): epilogue + output write for row i-1.
  y_ref[0] = _mlp_epilogue(
      acc2, hs, x_prev, b2_ref, s2_ref, t_real, quantized
  )


def _pallas_forward(x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2, causal,
                    valid_len=None, quantized=False):
  b, t_real, c = x.shape
  if valid_len is not None:
    t_real = valid_len
  k = wu.shape[0]
  mult = wu.shape[-1] // c
  hid = w1.shape[1]
  # m-major flat layouts matching the kernel's [T, mult*C] hidden (channel
  # block m occupies lanes [m*C, (m+1)*C)); conv layout is c-major
  # (flat index c*mult + m), hence the transpose.
  wu2 = wu.reshape(k, c, mult).transpose(0, 2, 1).reshape(k, mult * c)
  wm2 = wm.reshape(k, c, mult).transpose(0, 2, 1).reshape(k, mult * c)
  bu1 = bu.reshape(c, mult).T.reshape(mult * c)
  bm1 = bm.reshape(c, mult).sum(axis=-1)  # lanes summed -> one [C] bias

  # Pad time to the fp32 sublane multiple; rotates on unaligned sublane
  # counts are not lowerable. (A caller that pre-pads the stack passes
  # t % 8 == 0 plus valid_len, making this a no-op.) Additionally keep
  # >= k-1 trailing zero rows so the kernel can take its maskless-shift
  # halo path (see _kernel).
  t_orig = x.shape[1]
  pad_t = -t_orig % 8
  if (t_orig + pad_t) - t_real < k - 1:
    pad_t += 8
  if pad_t:
    x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
  t = x.shape[1]

  # Pipelined grid: b+1 steps. Step i runs stage 1 on row min(i, b-1) and
  # stage 2 on row i-1 (clamped); the clamps make the first/last steps
  # compute harmless extra work instead of branching (pl.when regions are
  # separate basic blocks, which would defeat the VPU/MXU interleave).
  in_row = lambda i: (jnp.minimum(i, b - 1), 0, 0)
  out_row = lambda i: (jnp.maximum(i - 1, 0), 0, 0)

  operands = [x, g1, wu2, bu1, wm2, bm1, g2]
  in_specs = [
      pl.BlockSpec((1, t, c), in_row, memory_space=pltpu.VMEM),
      pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
      pl.BlockSpec((k, mult * c), lambda i: (0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((mult * c,), lambda i: (0,), memory_space=pltpu.VMEM),
      pl.BlockSpec((k, mult * c), lambda i: (0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
      pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
  ]
  if quantized:
    from tapnet_tpu.ops import mixer_math

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

  # Scratch carrying stage-1 products across one grid step: the channel-MLP
  # operand, (int8 path) its per-row activation scale, and the residual
  # stream the MLP output adds onto.
  scratch_shapes = [
      pltpu.VMEM((t, c), jnp.int8 if quantized else x.dtype),
  ]
  if quantized:
    scratch_shapes.append(pltpu.VMEM((t, 1), jnp.float32))
  scratch_shapes.append(pltpu.VMEM((t, c), x.dtype))

  out = pl.pallas_call(
      functools.partial(
          _kernel, k=k, mult=mult, causal=causal, t_real=t_real,
          quantized=quantized,
      ),
      grid=(b + 1,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((1, t, c), out_row, memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
      scratch_shapes=scratch_shapes,
      # The resident weights (w1/w2: 4 MB bf16 at production C=512) plus the
      # kernel's fp32 temporaries exceed XLA's default 16 MB scoped-vmem
      # budget; v5e has 128 MB of physical VMEM.
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=100 * 1024 * 1024,
      ),
      interpret=FORCE_INTERPRET,
  )(*operands)
  return out[:, :t_orig] if pad_t else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def mixer_block(x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2,
                causal: bool = False, valid_len=None,
                quantized: bool = False):
  """Fused mixer block: x += dwconv(LN(x)); x += MLP(LN(x)).

  Args:
    x: [B, T, C] trajectories.
    g1 / g2: [C] LayerNorm scales (temporal / channel).
    wu / wm: [k, 1, mult*C] depthwise conv kernels (conv layout).
    bu / bm: [mult*C] depthwise conv biases.
    w1: [C, H]; b1: [H]; w2: [H, C]; b2: [C] channel-MLP params.
    causal: causal (left-only) vs SAME temporal padding.
    valid_len: if set, rows >= valid_len are padding — ignored on input,
      exactly zero on output. Lets a block stack pad T to the sublane
      multiple once instead of per block.
    quantized: run the channel MLP in w8a8 int8 (per-row dynamic activation
      scales, per-column weight scales, int32 MXU accumulation). The
      temporal conv and LNs stay full precision. The backward pass is a
      straight-through estimator through the full-precision math.

  Returns:
    [B, T, C], same dtype as x.
  """
  if FORCE_INTERPRET:
    return _pallas_forward(
        x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2, causal, valid_len,
        quantized,
    )
  if not ENABLED:
    return _math_reference(
        x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2, causal, valid_len,
        quantized,
    )
  return jax.lax.platform_dependent(
      x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2,
      tpu=functools.partial(_pallas_forward, causal=causal,
                            valid_len=valid_len, quantized=quantized),
      default=functools.partial(_math_reference, causal=causal,
                                valid_len=valid_len, quantized=quantized),
  )


def _fwd(x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2, causal, valid_len,
         quantized):
  out = mixer_block(
      x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2, causal, valid_len,
      quantized,
  )
  return out, (x, g1, wu, bu, wm, bm, g2, w1, b1, w2, b2)


def _bwd(causal, valid_len, quantized, res, g):
  # Straight-through for the quantized path: gradients flow through the
  # full-precision math (quantization is an inference-time mode).
  _, vjp = jax.vjp(
      lambda *args: _math_reference(*args, causal, valid_len), *res
  )
  return vjp(g)


mixer_block.defvjp(_fwd, _bwd)
