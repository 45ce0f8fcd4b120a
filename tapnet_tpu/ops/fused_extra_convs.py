"""One ExtraConvs layer as a single fused Pallas TPU kernel.

An ExtraConvs layer (reference: tapnet/models/tapir_model.py:159-186) is
    t = LayerNorm(x);  y = t + conv3x3_out(gelu(conv3x3_up(t)))
with a 4x channel expansion in the middle. At the 480p north-star workload
the stack is ~43 TFLOP of 3x3 convolutions, but the XLA path is bounded
well above the MXU floor by HBM round-trips of the 4x hidden activation
([250, 60, 60, 1024] bf16 ~ 1.8 GB, written by conv_up, re-read by GELU,
re-read by the quantize pass, re-read by conv_out) plus the per-frame
quantize/dequant sweeps of the int8 mode: measured 0.204 s vs the ~0.11 s
int8 matmul floor (xprof, PERFORMANCE.md r4).

This kernel processes ONE frame per grid step. The frame is pre-padded by
one pixel on each side and flattened to rows ([HP*WP, C], HP=H+2, WP=W+2),
so a 3x3 tap (dy, dx) is a single sublane roll by dy*WP+dx rows: both
convolutions become 9 shifted [R, C] x [C, M] matmuls accumulating in
VMEM, and LN statistics, the int8 quantization, the 4x hidden and the GELU
never touch HBM. Pad rows are kept exactly zero (LN has a bias, so they
are re-masked after every bias add); roll wraparound can only land on pad
rows, which the final output mask zeroes.

int8 mode upgrades the quantization scheme over ops/qconv.py: activation
scales are PER PIXEL (per row of the flattened frame) instead of per
frame — exact dequantization is preserved by dequantizing per tap
(out = sum_j (tq[r+o_j] . wq_j) * xs[r+o_j] * ws), which only a
tap-decomposed kernel can do. Weight scales stay per-output-channel.
Per-pixel scales strictly reduce quantization error vs the per-frame
scheme (the error is activation-dominated, scratch/qec_error_attrib.py).

Backward recomputes through `jax.vjp` of the full-precision jnp reference
(straight-through for the int8 mode), like the other fused ops here.
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

# Production gate. When False, extra_convs_layer runs the XLA reference
# formulation on every backend.
ENABLED = True

# Fuse only when the activation tensor is large enough that its hidden
# HBM round-trips dominate the resident-weight DMA (~9.4 MB bf16 per
# layer invocation).
_MIN_FUSED_ELEMENTS = 4 * 1024 * 1024

_EPS = 1e-5


def wants_fused(x, per_pixel: bool = False) -> bool:
  """Gate: 4-D [N, H, W, C] activations, big enough, lane-aligned C.

  The kernel is used ONLY for the per-pixel int8 mode — its value is the
  finer quantization (only a tap-decomposed kernel can dequantize
  per-pixel scales exactly), not speed. Measured on the 5-layer 480p
  stack (scratch/bench_fused_ec.py): bf16 fused LOSES 293 vs 245 ms
  (XLA's conv is already within ~15% of the MXU floor) and per-frame-int8
  fused LOSES 199 vs 167 ms (XLA overlaps its quantize/dequant HBM sweeps
  with MXU work; the kernel's serial VPU+MXU schedule does not).
  """
  return (
      bool(ENABLED)
      and per_pixel
      and x.ndim == 4
      and x.size >= _MIN_FUSED_ELEMENTS
      and x.shape[-1] % 128 == 0
  )


def _ln_bias(x, g, b):
  """Flax-parity LayerNorm over channels with scale AND bias, fp32 stats."""
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
  return (xf - mu) * jax.lax.rsqrt(var + _EPS) * g.astype(
      jnp.float32
  ) + b.astype(jnp.float32)


def _shifted_nhwc(t, dy, dx):
  """Zero-boundary spatial shift of [N, H, W, C] (reference math)."""
  return jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))[
      :, 1 + dy : t.shape[1] + 1 + dy, 1 + dx : t.shape[2] + 1 + dx
  ]


def _w_scales(w):
  """Per-output-channel symmetric int8 weight scales (qconv convention)."""
  amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
  return jnp.maximum(amax, 1e-8) * (1.0 / 127.0)


def _q_rows(v):
  """Symmetric per-row int8 quantization of fp32 [..., C]."""
  amax = jnp.maximum(jnp.max(jnp.abs(v), axis=-1, keepdims=True), 1e-8)
  s = amax * (1.0 / 127.0)
  q = jnp.clip(jnp.round(v / s), -127.0, 127.0).astype(jnp.int8)
  return q, s


def _math_reference(x, g, bln, wu, bu, wo, bo, quantized):
  """jnp reference of the fused layer — the numerics contract.

  quantized=False matches the production unfused path exactly
  (qconv.conv2d_fp_math semantics: conv operands in x.dtype, fp32
  accumulation). quantized=True implements the kernel's per-pixel /
  per-tap scheme, which the dense-conv qconv path cannot express.
  """
  t32 = _ln_bias(x, g, bln)
  t = t32.astype(x.dtype)

  def conv_fp(v, w, b):
    y = jax.lax.conv_general_dilated(
        v,
        w.astype(v.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b.astype(jnp.float32)

  def conv_q8_patch(v32, w, b):
    # Per-output-pixel activation scale over the pixel's full 3x3xC
    # receptive field; ONE quantized matmul over the concatenated patch.
    ws = _w_scales(w)
    wq = jnp.clip(
        jnp.round(w.astype(jnp.float32) / ws), -127.0, 127.0
    ).astype(jnp.int8)
    patches = jnp.concatenate(
        [
            _shifted_nhwc(v32, dy, dx)
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ],
        axis=-1,
    )
    pq, p_s = _q_rows(patches)
    acc = jnp.einsum(
        "nhwk,km->nhwm",
        pq,
        wq.reshape(-1, w.shape[-1]),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (p_s * ws) + b.astype(jnp.float32)

  def conv_q8(v32, w, b):
    # Per-pixel activation scales, per-tap exact dequantization.
    ws = _w_scales(w)
    wq = jnp.clip(
        jnp.round(w.astype(jnp.float32) / ws), -127.0, 127.0
    ).astype(jnp.int8)
    vq, vs = _q_rows(v32)
    acc = jnp.zeros(v32.shape[:-1] + (w.shape[-1],), jnp.float32)
    for dy in (-1, 0, 1):
      for dx in (-1, 0, 1):
        part = jnp.einsum(
            "nhwc,cm->nhwm",
            _shifted_nhwc(vq, dy, dx).astype(jnp.int8),
            wq[1 + dy, 1 + dx],
            preferred_element_type=jnp.int32,
        )
        acc = acc + part.astype(jnp.float32) * (
            _shifted_nhwc(vs, dy, dx) * ws
        )
    return acc + b.astype(jnp.float32)

  if quantized:
    hidden = jax.nn.gelu(conv_q8_patch(t32, wu, bu))
    out = conv_q8(hidden, wo, bo)
  else:
    hidden = jax.nn.gelu(conv_fp(t, wu, bu)).astype(x.dtype)
    out = conv_fp(hidden, wo, bo)
  return (t32 + out).astype(x.dtype)


def _kernel(x_ref, g_ref, bln_ref, wu_ref, bu_ref, wo_ref, bo_ref, *rest,
            h, w, quantized):
  if quantized:
    su_ref, so_ref, y_ref = rest
  else:
    (y_ref,) = rest
  wp = w + 2
  x = x_ref[0]  # [R, C]; pad + alignment rows hold anything (masked below)
  r_rows = x.shape[0]
  r = jax.lax.broadcasted_iota(jnp.int32, (r_rows, 1), 0)
  hh = r // wp
  ww = r - hh * wp
  valid = (hh >= 1) & (hh <= h) & (ww >= 1) & (ww <= w)

  t32 = _ln_bias(x, g_ref[:], bln_ref[:])
  # LN has a bias: pad rows must be re-zeroed so shifted reads see zeros.
  t32 = jnp.where(valid, t32, jnp.zeros_like(t32))

  offsets = [dy * wp + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

  def roll(v, off):
    if off == 0:
      return v
    return pltpu.roll(v, (-off) % r_rows, axis=0)

  def conv(v32, w_ref, s_w_ref, bias_ref, out_width):
    """9-tap shifted matmul; v32 fp32 [R, C_in] with zero pad rows.

    The tap shift is applied to the matmul OUTPUT, not the input:
    out[r] += dot(v, w_j)[r + off_j] — valid because each tap's matmul is
    row-wise. This (a) sidesteps Mosaic's no-8-bit-rotate limit on the
    int8 path, and (b) leaves the 9 dots operating on ONE shared operand,
    so the MXU streams them back-to-back while the result rolls/dequant
    FMAs are independent VPU work.
    """
    acc = jnp.zeros((r_rows, out_width), jnp.float32) + bias_ref[
        :
    ].astype(jnp.float32)
    if quantized:
      vq, vs = _q_rows(v32)
      sw = s_w_ref[:]
      for j, off in enumerate(offsets):
        d = jnp.dot(vq, w_ref[j], preferred_element_type=jnp.int32)
        acc = acc + roll(d, off).astype(jnp.float32) * (
            roll(vs, off) * sw
        )
    else:
      v16 = v32.astype(x.dtype)
      for j, off in enumerate(offsets):
        d = jnp.dot(v16, w_ref[j], preferred_element_type=jnp.float32)
        acc = acc + roll(d, off)
    return acc

  if quantized:
    # conv_up via the patch-concat scheme: one per-output-pixel scale over
    # the 3x3xC receptive field, ONE K=9C int8 matmul, ONE dequant FMA.
    # (conv_out can't use it: its 9M-wide patch would blow VMEM.)
    cc = jnp.concatenate([roll(t32, off) for off in offsets], axis=-1)
    cq, cs = _q_rows(cc)
    d = jnp.dot(cq, wu_ref[:], preferred_element_type=jnp.int32)
    hidden = d.astype(jnp.float32) * (cs * su_ref[:]) + bu_ref[:].astype(
        jnp.float32
    )
  else:
    hidden = conv(t32, wu_ref, None, bu_ref, wu_ref.shape[-1])
  # Mask before GELU: pad rows carry gelu(bias) otherwise, and the second
  # conv's shifted reads would leak it into edge pixels.
  hidden = jnp.where(valid, jax.nn.gelu(hidden), jnp.zeros_like(hidden))
  out = conv(hidden, wo_ref, so_ref if quantized else None, bo_ref,
             wo_ref.shape[-1])
  y = jnp.where(valid, t32 + out, jnp.zeros_like(out))
  y_ref[0] = y.astype(x.dtype)


def _pallas_forward(x, g, bln, wu, bu, wo, bo, quantized):
  n, h, w, c = x.shape
  m = wu.shape[-1]
  wp, hp = w + 2, h + 2
  r0 = hp * wp
  r = -(-r0 // 8) * 8

  # Pad one pixel per side, flatten to rows, pad rows to the sublane
  # multiple (row-major reshape is layout-free; one fused XLA pad pass).
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(n, r0, c)
  if r != r0:
    xp = jnp.pad(xp, ((0, 0), (0, r - r0), (0, 0)))

  wu2 = wu.reshape(9, c, m)
  wo2 = wo.reshape(9, m, c)
  operands = [xp, g, bln]
  vec = lambda i: (0,)
  whole3 = lambda i: (0, 0, 0)
  in_specs = [
      pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((c,), vec, memory_space=pltpu.VMEM),
      pl.BlockSpec((c,), vec, memory_space=pltpu.VMEM),
  ]

  if quantized:
    su = _w_scales(wu)
    so = _w_scales(wo)
    # conv_up weights flat [9C, M] for the patch-concat matmul.
    wu_q = jnp.clip(
        jnp.round(wu2.reshape(9 * c, m).astype(jnp.float32) / su),
        -127.0, 127.0,
    ).astype(jnp.int8)
    wo_q = jnp.clip(
        jnp.round(wo2.astype(jnp.float32) / so), -127.0, 127.0
    ).astype(jnp.int8)
    operands += [wu_q, bu, wo_q, bo, su, so]
    in_specs += [
        pl.BlockSpec((9 * c, m), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
  else:
    operands += [wu2.astype(x.dtype), bu, wo2.astype(x.dtype), bo]
    in_specs += [
        pl.BlockSpec((9, c, m), whole3, memory_space=pltpu.VMEM),
    ]
  in_specs += [
      pl.BlockSpec((m,), vec, memory_space=pltpu.VMEM),
      pl.BlockSpec((9, m, c), whole3, memory_space=pltpu.VMEM),
      pl.BlockSpec((c,), vec, memory_space=pltpu.VMEM),
  ]
  if quantized:
    in_specs += [
        pl.BlockSpec((m,), vec, memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), vec, memory_space=pltpu.VMEM),
    ]

  yp = pl.pallas_call(
      functools.partial(_kernel, h=h, w=w, quantized=quantized),
      grid=(n,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, r, c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=110 * 1024 * 1024,
      ),
      interpret=FORCE_INTERPRET,
  )(*operands)

  return yp[:, :r0].reshape(n, hp, wp, c)[:, 1 : 1 + h, 1 : 1 + w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def extra_convs_layer(x, g, bln, wu, bu, wo, bo, quantized=False):
  """Fused ExtraConvs layer: LN -> conv3x3(C->M) -> GELU -> conv3x3(M->C)
  -> residual on the LN output.

  Args:
    x: [N, H, W, C] activations (N = batch*frames).
    g / bln: [C] LayerNorm scale and bias.
    wu: [3, 3, C, M] expansion conv kernel; bu: [M].
    wo: [3, 3, M, C] output conv kernel; bo: [C].
    quantized: w8a8 int8 matmuls with PER-PIXEL activation scales and
      per-output-channel weight scales (see module docstring). Backward is
      a straight-through estimator through the full-precision math.

  Returns:
    [N, H, W, C], same dtype as x.
  """
  if FORCE_INTERPRET:
    return _pallas_forward(x, g, bln, wu, bu, wo, bo, quantized)
  if not ENABLED:
    return _math_reference(x, g, bln, wu, bu, wo, bo, quantized)
  return jax.lax.platform_dependent(
      x, g, bln, wu, bu, wo, bo,
      tpu=functools.partial(_pallas_forward, quantized=quantized),
      default=functools.partial(_math_reference, quantized=quantized),
  )


def _fwd(x, g, bln, wu, bu, wo, bo, quantized):
  out = extra_convs_layer(x, g, bln, wu, bu, wo, bo, quantized)
  return out, (x, g, bln, wu, bu, wo, bo)


def _bwd(quantized, res, grad):
  _, vjp = jax.vjp(
      lambda *args: _math_reference(*args, quantized=False), *res
  )
  return vjp(grad)


extra_convs_layer.defvjp(_fwd, _bwd)
