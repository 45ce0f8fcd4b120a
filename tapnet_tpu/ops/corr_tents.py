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


def _kernel(g_ref, q_ref, cy_ref, cx_ref, out_ref, *, p):
  g = g_ref[0]  # [H, W, C]
  q = q_ref[0]  # [NT, C]
  h, w, _ = g.shape
  nt = q.shape[0]

  cy = cy_ref[0, 0].astype(jnp.float32)  # [NT]
  cx = cx_ref[0, 0].astype(jnp.float32)
  half = (p - 1) / 2

  # Correlation (MXU, fp32 accumulation -> compute dtype) and stage-1 tent
  # contraction Y[p, w, n] = sum_h wy[h, p, n] * corr[h, w, n] (VPU),
  # slab-by-slab over H so only [slab, W, NT] slices are ever live. Tent
  # weights are rebuilt per tap from iotas (slicing a precomputed [H, p, NT]
  # tensor produces offset layouts Mosaic cannot reduce over).
  ys = [jnp.zeros((w, nt), jnp.float32) for _ in range(p)]
  for s in range(0, h, _H_SLAB):
    hs = min(_H_SLAB, h - s)
    corr_s = jax.lax.dot_general(
        g[s : s + hs],
        q,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)  # [hs, W, NT]
    iy = (
        jax.lax.broadcasted_iota(jnp.int32, (hs, 1, 1), 0).astype(jnp.float32)
        + s
    )
    for i in range(p):
      wy_i = jax.nn.relu(
          1.0 - jnp.abs(cy[None, None, :] + (i - half) - iy)
      ).astype(g.dtype)  # [hs, 1, NT]
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


def _pallas_forward(grid, query, cy, cx, p):
  bt, h, w, c = grid.shape
  n = query.shape[1]
  tile_n = _TILE_N
  pad_n = -n % tile_n
  if pad_n:
    query = jnp.pad(query, ((0, 0), (0, pad_n), (0, 0)))
    cy = jnp.pad(cy, ((0, 0), (0, pad_n)))
    cx = jnp.pad(cx, ((0, 0), (0, pad_n)))
  np_ = query.shape[1]

  out = pl.pallas_call(
      functools.partial(_kernel, p=p),
      grid=(bt, np_ // tile_n),
      in_specs=[
          pl.BlockSpec(
              (1, h, w, c), lambda b, i: (b, 0, 0, 0),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (1, tile_n, c), lambda b, i: (b, i, 0),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (1, 1, tile_n), lambda b, i: (b, 0, i),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (1, 1, tile_n), lambda b, i: (b, 0, i),
              memory_space=pltpu.VMEM,
          ),
      ],
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
  )(grid, query, cy[:, None, :], cx[:, None, :])
  return out[..., :n] if pad_n else out


# One frame's feature grid must fit in VMEM (double-buffered) next to the
# slab intermediates and query/output tiles; beyond this, fall back to the
# einsum formulation. 12 MB covers 720p-class grids (180x180x128 bf16 =
# 8.3 MB; measured 1.07x over the einsum, ~1 min first compile). 1080p
# grids (270x270, 18.7 MB) fit the raised vmem budget but Mosaic compile
# does not terminate in reasonable time — keep them on the einsum path.
_MAX_FRAME_BYTES = 12 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def corr_tent_patches(grid, query, cy, cx, p: int = 7):
  """Correlation patches around track positions, without the HBM volume.

  Args:
    grid: [BT, H, W, C] feature grids (one per (batch, frame)).
    query: [BT, N, C] per-frame query descriptors.
    cy / cx: [BT, N] patch centers in grid index space (raster - 0.5).
    p: patch size (odd).

  Returns:
    [BT, p, p, N] fp32 tent-interpolated correlation patches.
  """
  if FORCE_INTERPRET:
    return _pallas_forward(grid, query, cy, cx, p)
  frame_bytes = int(np.prod(grid.shape[1:])) * grid.dtype.itemsize
  if frame_bytes > _MAX_FRAME_BYTES:
    return _math_reference(grid, query, cy, cx, p)
  return jax.lax.platform_dependent(
      grid,
      query,
      cy,
      cx,
      tpu=functools.partial(_pallas_forward, p=p),
      default=functools.partial(_math_reference, p=p),
  )


def _fwd(grid, query, cy, cx, p):
  return corr_tent_patches(grid, query, cy, cx, p), (grid, query, cy, cx)


def _bwd(p, res, g):
  grid, query, cy, cx = res
  _, vjp = jax.vjp(
      lambda *args: _math_reference(*args, p), grid, query, cy, cx
  )
  return vjp(g)


corr_tent_patches.defvjp(_fwd, _bwd)
