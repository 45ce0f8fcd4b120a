"""Fused local-correlation + bilinear-tent patch extraction (Pallas, TPU).

TAPIR's refinement reads, for every query n and frame t, a p x p patch of the
correlation map between the query descriptor and the frame's feature grid,
bilinearly interpolated at the current track position (reference:
tapnet/models/tapir_model.py:494-563). The XLA formulation materializes the
full [B, N, T, H, W] correlation volume in HBM (written by the cost einsum,
read back by two tent-weight contractions) — at 480p with 1024 queries that
is ~3 GB of traffic per refinement iteration and the dominant non-mixer cost.

This kernel never materializes the volume: for each (b, t) it keeps the
frame's feature grid [H, W, C] in VMEM, computes the correlation against a
tile of queries on the MXU, and immediately collapses it to p x p tent
patches on the VPU. HBM traffic drops to one read of the feature grid per
frame (+ queries/outputs), a ~6x cut.

Semantics match `tapir._corr_patches`'s matmul path bit-for-bit in spirit:
correlation accumulated in fp32 on the MXU and rounded to bf16, tent weights
`relu(1 - |c + d - i|)` (zero outside the grid = constant-mode boundary),
tent contraction accumulated in fp32.

The backward pass recomputes through the einsum formulation (`jax.vjp` of a
jnp reference), like the other fused ops in this package.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# Test hook: run the kernel in interpreter mode on CPU.
FORCE_INTERPRET = False

# Per-block query tile. 128 = one full lane register and the production
# query-chunk size; Pallas block specs also require the last dim to be a
# multiple of 128 (queries are padded up).
_TILE_N = 128

# The correlation is computed in slabs of H rows so the [slab, W, N] slices
# (the only O(H*W*N) intermediates) stay small; the full [H, W, N] volume
# never exists, even in VMEM.
_H_SLAB = 32


def _tent_weights(coords, size, patch_size):
  """[..., p, size] separable tent weights (see tapir._tent_weights)."""
  offsets = (
      jnp.arange(patch_size, dtype=coords.dtype) - (patch_size - 1) / 2
  )
  cells = jnp.arange(size, dtype=coords.dtype)
  centers = coords[..., None] + offsets
  return jax.nn.relu(1.0 - jnp.abs(centers[..., None] - cells))


def _quantize_lastdim(v, eps=1e-8):
  """Symmetric per-row int8 quantization over the last axis.

  Returns (int8 values, fp32 scale without the last axis); same formulas
  as mixer_math.quantize_rows.
  """
  vf = v.astype(jnp.float32)
  amax = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1), eps)
  scale = amax * (1.0 / 127.0)
  q = jnp.clip(
      jnp.round(vf / scale[..., None]), -127.0, 127.0
  ).astype(jnp.int8)
  return q, scale


def _math_reference(grid, query, cy, cx, p):
  """Unfused einsum formulation: [BT, H, W, C] x [BT, N, C] -> [BT, p, p, N].

  cy/cx: [BT, N] patch centers in index space.
  """
  dtype = grid.dtype
  corrs = jnp.einsum(
      "bhwc,bnc->bnhw", grid, query, preferred_element_type=jnp.float32
  ).astype(dtype)
  h, w = grid.shape[1:3]
  wy = _tent_weights(cy.astype(jnp.float32), h, p).astype(dtype)  # [BT,N,p,H]
  wx = _tent_weights(cx.astype(jnp.float32), w, p).astype(dtype)  # [BT,N,p,W]
  pat = jnp.einsum(
      "bnph,bnhw->bnpw", wy, corrs, preferred_element_type=jnp.float32
  ).astype(dtype)
  pat = jnp.einsum(
      "bnqw,bnpw->bnpq", wx, pat, preferred_element_type=jnp.float32
  )
  return pat.transpose(0, 2, 3, 1)  # [BT, p, p, N]


def quantize_per_frame(grid):
  """Pre-quantizes feature grids for the per-frame int8 correlation mode.

  [..., H, W, C] -> (int8 grid, fp32 scalar scale per leading index).
  Hoist this OUT of the refinement chunk/iteration loops: re-quantizing
  the same grids inside the loop was measured to cost more than the int8
  MXU saving (PERFORMANCE.md r5).
  """
  gf = grid.astype(jnp.float32)
  axes = tuple(range(grid.ndim - 3, grid.ndim))
  amax = jnp.maximum(
      jnp.max(jnp.abs(gf), axis=axes, keepdims=True), 1e-8
  )
  q = jnp.clip(
      jnp.round(gf * (127.0 / amax)), -127.0, 127.0
  ).astype(jnp.int8)
  return q, (amax * (1.0 / 127.0)).reshape(grid.shape[:-3])


def _math_reference_prequantized(grid_q8, frame_scale, query, cy, cx, p):
  """Einsum mirror of the pre-quantized per-frame kernel path: int32
  correlation -> bf16 tents, all scales folded into the output."""
  qq, qs = _quantize_lastdim(query)
  corr_i = jnp.einsum(
      "bhwc,bnc->bnhw",
      grid_q8.astype(jnp.int8),
      qq.astype(jnp.int8),
      preferred_element_type=jnp.int32,
  )
  corrs = corr_i.astype(jnp.bfloat16)
  h, w = grid_q8.shape[1:3]
  wy = _tent_weights(cy.astype(jnp.float32), h, p).astype(jnp.bfloat16)
  wx = _tent_weights(cx.astype(jnp.float32), w, p).astype(jnp.bfloat16)
  pat = jnp.einsum(
      "bnph,bnhw->bnpw", wy, corrs, preferred_element_type=jnp.float32
  ).astype(jnp.bfloat16)
  pat = jnp.einsum(
      "bnqw,bnpw->bnpq", wx, pat, preferred_element_type=jnp.float32
  )
  pat = pat * (qs * frame_scale[:, None])[:, :, None, None]
  return pat.transpose(0, 2, 3, 1)  # [BT, p, p, N]


def _math_reference_quantized(grid, query, cy, cx, p, per_frame=False):
  """int8 formulation mirroring the quantized kernel: grid quantized per
  position (or per frame with a scalar scale), query per descriptor,
  int32 correlation, grid scales applied before the (bf16) tent
  contraction, per-query scales folded into the output."""
  if per_frame:
    gf = grid.astype(jnp.float32)
    amax = jnp.maximum(
        jnp.max(jnp.abs(gf), axis=(1, 2, 3), keepdims=True), 1e-8
    )
    gq = jnp.clip(
        jnp.round(gf * (127.0 / amax)), -127.0, 127.0
    ).astype(jnp.int8)
    gs = jnp.broadcast_to(
        amax[..., 0] * (1.0 / 127.0), grid.shape[:3]
    )  # [BT,H,W] (constant per frame)
  else:
    gq, gs = _quantize_lastdim(grid)  # [BT,H,W] scales
  qq, qs = _quantize_lastdim(query)  # [BT,N] scales
  corr_i = jnp.einsum(
      "bhwc,bnc->bnhw",
      gq.astype(jnp.int8),
      qq.astype(jnp.int8),
      preferred_element_type=jnp.int32,
  )
  corrs = (
      corr_i.astype(jnp.float32) * gs[:, None]
  ).astype(jnp.bfloat16)
  h, w = grid.shape[1:3]
  wy = _tent_weights(cy.astype(jnp.float32), h, p).astype(jnp.bfloat16)
  wx = _tent_weights(cx.astype(jnp.float32), w, p).astype(jnp.bfloat16)
  pat = jnp.einsum(
      "bnph,bnhw->bnpw", wy, corrs, preferred_element_type=jnp.float32
  ).astype(jnp.bfloat16)
  pat = jnp.einsum(
      "bnqw,bnpw->bnpq", wx, pat, preferred_element_type=jnp.float32
  )
  pat = pat * qs[:, :, None, None]
  return pat.transpose(0, 2, 3, 1)  # [BT, p, p, N]


def _kernel(g_ref, q_ref, cy_ref, cx_ref, out_ref, *, p, gs_ref=None):
  g = g_ref[0]  # [H, W, C] (compute dtype, or int8 on the quantized paths)
  q = q_ref[0]  # [NT, C]
  h, w, _ = g.shape
  nt = q.shape[0]
  int8_in = g.dtype == jnp.int8

  cy = cy_ref[0, 0].astype(jnp.float32)  # [NT]
  cx = cx_ref[0, 0].astype(jnp.float32)
  half = (p - 1) / 2

  # Correlation (MXU; fp32 accumulation -> compute dtype, or int8 x int8 ->
  # int32; per-position grid scales, when given, applied on dequant — the
  # per-frame-scalar mode instead folds ALL scales into the output outside
  # the kernel, adding zero VPU work here) and stage-1 tent contraction
  # Y[p, w, n] = sum_h wy[h, p, n] * corr[h, w, n] (VPU), slab-by-slab over
  # H so only [slab, W, NT] slices are ever live. Tent weights are rebuilt
  # per tap from iotas (slicing a precomputed [H, p, NT] tensor produces
  # offset layouts Mosaic cannot reduce over).
  tent_dtype = jnp.bfloat16 if int8_in else g.dtype
  ys = [jnp.zeros((w, nt), jnp.float32) for _ in range(p)]
  for s in range(0, h, _H_SLAB):
    hs = min(_H_SLAB, h - s)
    corr_s = jax.lax.dot_general(
        g[s : s + hs],
        q,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.int32 if int8_in else jnp.float32,
    )  # [hs, W, NT]
    if gs_ref is not None:
      corr_s = (
          corr_s.astype(jnp.float32) * gs_ref[0][s : s + hs][..., None]
      )
    corr_s = corr_s.astype(tent_dtype)
    iy = (
        jax.lax.broadcasted_iota(jnp.int32, (hs, 1, 1), 0).astype(jnp.float32)
        + s
    )
    for i in range(p):
      wy_i = jax.nn.relu(
          1.0 - jnp.abs(cy[None, None, :] + (i - half) - iy)
      ).astype(tent_dtype)  # [hs, 1, NT]
      ys[i] = ys[i] + jnp.sum(
          wy_i * corr_s, axis=0, dtype=jnp.float32
      )
  # Stage 2: Z[p, q, n] = sum_w wx[w, q, n] * Y[p, w, n].
  ix = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).astype(jnp.float32)
  for j in range(p):
    wxj = jax.nn.relu(
        1.0 - jnp.abs(cx[None, :] + (j - half) - ix)
    )  # [W, NT] fp32
    for i in range(p):
      out_ref[0, i, j, :] = jnp.sum(
          wxj * ys[i], axis=0, dtype=jnp.float32
      )


def _kernel_quantized(g_ref, q_ref, gs_ref, cy_ref, cx_ref, out_ref, *, p):
  _kernel(g_ref, q_ref, cy_ref, cx_ref, out_ref, p=p, gs_ref=gs_ref)


def _pallas_forward(grid, query, cy, cx, p, quantized=False,
                    frame_scale=None):
  bt, h, w, c = grid.shape
  n = query.shape[1]
  tile_n = _TILE_N
  pad_n = -n % tile_n
  if pad_n:
    query = jnp.pad(query, ((0, 0), (0, pad_n), (0, 0)))
    cy = jnp.pad(cy, ((0, 0), (0, pad_n)))
    cx = jnp.pad(cx, ((0, 0), (0, pad_n)))
  np_ = query.shape[1]

  grid_spec = pl.BlockSpec(
      (1, h, w, c), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM
  )
  query_spec = pl.BlockSpec(
      (1, tile_n, c), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
  )
  center_spec = pl.BlockSpec(
      (1, 1, tile_n), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM
  )
  operands = [grid, query]
  in_specs = [grid_spec, query_spec]
  if frame_scale is not None:
    # Grid arrives pre-quantized (quantize_per_frame, hoisted out of the
    # refinement loops); only the (cheap, per-call) query quantization
    # happens here. All scales fold into the output.
    quantized = "per_frame"
    qq, qs = _quantize_lastdim(query)
    operands = [grid, qq]
    kernel = functools.partial(_kernel, p=p)
  elif quantized == "per_frame":
    # int8 MXU path with ZERO added in-kernel work: one scalar scale per
    # frame grid and one per query descriptor, both pure per-output
    # factors folded in after the kernel (patches[b, :, :, n] *=
    # gs[b] * qs[b, n]). Halves the grid's HBM read traffic. Coarser
    # quantization than per-position, but grids are L2-normalized per
    # position so the dynamic range within a frame is bounded.
    gf = grid.astype(jnp.float32)
    amax = jnp.maximum(
        jnp.max(jnp.abs(gf), axis=(1, 2, 3), keepdims=True), 1e-8
    )
    gq = jnp.clip(
        jnp.round(gf * (127.0 / amax)), -127.0, 127.0
    ).astype(jnp.int8)
    frame_scale = amax[:, 0, 0, 0] * (1.0 / 127.0)  # [BT]
    qq, qs = _quantize_lastdim(query)
    operands = [gq, qq]
    kernel = functools.partial(_kernel, p=p)
  elif quantized:
    # int8 MXU path: grid quantized per position (scales applied in-kernel
    # before the tent contraction mixes positions), query per descriptor
    # (a pure per-output-column factor, folded in after the kernel). Also
    # halves the grid's HBM read traffic. NOTE: measured SLOWER end-to-end
    # than bf16 at 480p (the kernel is VPU-bound and the in-kernel
    # dequant multiply adds VPU work) — prefer "per_frame".
    gq, gs = _quantize_lastdim(grid)
    qq, qs = _quantize_lastdim(query)
    operands = [gq, qq, gs]
    in_specs = in_specs + [
        pl.BlockSpec(
            (1, h, w), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        )
    ]
    kernel = functools.partial(_kernel_quantized, p=p)
  else:
    kernel = functools.partial(_kernel, p=p)

  out = pl.pallas_call(
      kernel,
      grid=(bt, np_ // tile_n),
      in_specs=in_specs + [center_spec, center_spec],
      out_specs=pl.BlockSpec(
          (1, p, p, tile_n), lambda b, i: (b, 0, 0, i),
          memory_space=pltpu.VMEM,
      ),
      out_shape=jax.ShapeDtypeStruct((bt, p, p, np_), jnp.float32),
      # The frame grid block (up to ~_MAX_FRAME_BYTES, double-buffered)
      # plus slab intermediates exceed the 16 MB default scoped-vmem
      # budget for >480p frames; v5e has 128 MB physical VMEM.
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary", "arbitrary"),
          vmem_limit_bytes=100 * 1024 * 1024,
      ),
      interpret=FORCE_INTERPRET,
  )(*operands, cy[:, None, :], cx[:, None, :])
  if quantized:
    out = out * qs[:, None, None, :]
    if frame_scale is not None:
      out = out * frame_scale[:, None, None, None]
  return out[..., :n] if pad_n else out


# One frame's feature grid must fit in VMEM (double-buffered) next to the
# slab intermediates and query/output tiles; beyond this, fall back to the
# einsum formulation. 12 MB covers 720p-class grids (180x180x128 bf16 =
# 8.3 MB; measured 1.07x over the einsum, ~1 min first compile). 1080p
# grids (270x270, 18.7 MB) fit the raised vmem budget but Mosaic compile
# does not terminate in reasonable time — keep them on the einsum path.
_MAX_FRAME_BYTES = 12 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def corr_tent_patches(
    grid, query, cy, cx, p: int = 7, quantized: bool = False
):
  """Correlation patches around track positions, without the HBM volume.

  Args:
    grid: [BT, H, W, C] feature grids (one per (batch, frame)).
    query: [BT, N, C] per-frame query descriptors.
    cy / cx: [BT, N] patch centers in grid index space (raster - 0.5).
    p: patch size (odd).
    quantized: w8a8 int8 correlation on the MXU (int32 accumulation).
      "per_frame" = scalar grid scale per frame + per-descriptor query
      scales, ALL folded into the output (zero added in-kernel work —
      the recommended mode). True = per-position grid scales applied
      in-kernel (tighter quantization; measured slower end-to-end at
      480p because the kernel is VPU-bound). The tent contraction stays
      bf16/fp32. Opt-in accuracy/speed trade, like the quantized
      mixer/ExtraConvs modes.

  Returns:
    [BT, p, p, N] fp32 tent-interpolated correlation patches.
  """
  if FORCE_INTERPRET:
    return _pallas_forward(grid, query, cy, cx, p, quantized)
  math_ref = (
      functools.partial(
          _math_reference_quantized, per_frame=quantized == "per_frame"
      )
      if quantized
      else _math_reference
  )
  frame_bytes = int(np.prod(grid.shape[1:])) * grid.dtype.itemsize
  if frame_bytes > _MAX_FRAME_BYTES:
    return math_ref(grid, query, cy, cx, p=p)
  return jax.lax.platform_dependent(
      grid,
      query,
      cy,
      cx,
      tpu=functools.partial(_pallas_forward, p=p, quantized=quantized),
      default=functools.partial(math_ref, p=p),
  )


def corr_tent_patches_prequantized(
    grid_q8, frame_scale, query, cy, cx, p: int = 7
):
  """Per-frame int8 correlation patches from a PRE-quantized grid.

  Inference-only (no VJP): the grid is quantized once per video via
  `quantize_per_frame` and reused across every refinement iteration and
  query chunk, so the quantization sweep is paid once instead of
  per-call.

  Args:
    grid_q8: [BT, H, W, C] int8 (from quantize_per_frame).
    frame_scale: [BT] fp32 per-frame scales.
    query / cy / cx / p: as corr_tent_patches.
  """
  if FORCE_INTERPRET:
    return _pallas_forward(
        grid_q8, query, cy, cx, p, frame_scale=frame_scale
    )
  frame_bytes = int(np.prod(grid_q8.shape[1:]))
  if frame_bytes > _MAX_FRAME_BYTES:
    return _math_reference_prequantized(
        grid_q8, frame_scale, query, cy, cx, p
    )
  return jax.lax.platform_dependent(
      grid_q8,
      frame_scale,
      query,
      cy,
      cx,
      tpu=functools.partial(
          lambda g, fs, q, cy_, cx_: _pallas_forward(
              g, q, cy_, cx_, p, frame_scale=fs
          )
      ),
      default=functools.partial(_math_reference_prequantized, p=p),
  )


def _fwd(grid, query, cy, cx, p, quantized):
  return (
      corr_tent_patches(grid, query, cy, cx, p, quantized),
      (grid, query, cy, cx),
  )


def _bwd(p, quantized, res, g):
  # Straight-through on the quantized path: gradients flow through the
  # full-precision einsum formulation (as in the other fused int8 ops).
  del quantized
  grid, query, cy, cx = res
  _, vjp = jax.vjp(
      lambda *args: _math_reference(*args, p), grid, query, cy, cx
  )
  return vjp(g)


corr_tent_patches.defvjp(_fwd, _bwd)
