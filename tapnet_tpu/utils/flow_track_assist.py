"""Optical-flow-assisted point-track annotation.

Reimplements the annotation-assist algorithm from the reference's
`colabs/optical_flow_track_assist.ipynb`: given dense optical flow and two
user clicks (a start and an end position), recover the most flow-consistent
trajectory between them with dynamic programming, where the per-step cost of
moving from source pixel q (frame t) to target pixel p (frame t+1) is

    || q + flow_t[q] - p ||                for q within `radius` of p.

The reference runs this as a torch `unfold` over all (2r+1)^2 window offsets
— materializing a [(2r+1)^2, H, W] candidate tensor. Here the offsets are a
`lax.fori_loop` running-min over dynamic slices of the padded cost map, so
peak memory stays O(H*W) and the whole per-frame update jits into one fused
TPU program; the backtrace (tiny, sequential, data-dependent) runs on host.

Also provides plain forward flow chaining (`chain_flow`) for the
single-click case, matching the colab's fallback behavior.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_BIG = 1e10


@functools.partial(jax.jit, static_argnames=("radius",))
def _dp_forward(flows: Array, init_cost: Array, radius: int):
  """Runs the forward DP over all frames.

  Args:
    flows: [T, H, W, 2] dense flow, (dx, dy) from frame t to t+1.
    init_cost: [H, W] cost at the first frame (0 at the start click,
      large elsewhere).
    radius: spatial search radius per step.

  Returns:
    final_cost: [H, W] accumulated cost at the last frame.
    argmins: [T, H, W] int32 flat window index of each pixel's best
      predecessor, for host-side backtracking.
  """
  window = 2 * radius + 1
  h, w = init_cost.shape

  def step(cost, flow):
    costp = jnp.pad(cost, radius, constant_values=_BIG)
    flowp = jnp.pad(flow, ((radius, radius), (radius, radius), (0, 0)))

    def body(k, carry):
      best, arg = carry
      oy = k // window
      ox = k % window
      c = jax.lax.dynamic_slice(costp, (oy, ox), (h, w))
      f = jax.lax.dynamic_slice(flowp, (oy, ox, 0), (h, w, 2))
      # Offset d = q - p; predicted landing error = flow[q] + d.
      dy = (oy - radius).astype(jnp.float32)
      dx = (ox - radius).astype(jnp.float32)
      pen = jnp.sqrt((f[..., 0] + dx) ** 2 + (f[..., 1] + dy) ** 2)
      cand = c + pen
      take = cand < best
      return jnp.where(take, cand, best), jnp.where(take, k, arg)

    best, arg = jax.lax.fori_loop(
        0,
        window * window,
        body,
        (jnp.full((h, w), _BIG, jnp.float32), jnp.zeros((h, w), jnp.int32)),
    )
    return best, arg

  final_cost, argmins = jax.lax.scan(step, init_cost, flows)
  return final_cost, argmins


def interpolate_track(
    flows: np.ndarray,
    start: Tuple[int, int],
    end: Tuple[int, int],
    radius: int = 20,
) -> np.ndarray:
  """Most flow-consistent trajectory between two annotated endpoints.

  Args:
    flows: [T-1, H, W, 2] dense optical flow in (dx, dy), frame t -> t+1.
    start: (x, y) pixel position at frame 0.
    end: (x, y) pixel position at frame T-1.
    radius: per-step search radius in pixels.

  Returns:
    [T, 2] float32 (x, y) positions, with track[0] == start and
    track[-1] == end.
  """
  flows = np.asarray(flows, np.float32)
  t_steps, h, w = flows.shape[:3]
  window = 2 * radius + 1

  x0 = int(np.clip(round(start[0]), 0, w - 1))
  y0 = int(np.clip(round(start[1]), 0, h - 1))
  x1 = int(np.clip(round(end[0]), 0, w - 1))
  y1 = int(np.clip(round(end[1]), 0, h - 1))

  init = np.full((h, w), _BIG, np.float32)
  init[y0, x0] = 0.0
  _, argmins = _dp_forward(jnp.asarray(flows), jnp.asarray(init), radius)
  argmins = np.asarray(argmins)

  # Backtrack from the (user-pinned) end position.
  track = np.zeros((t_steps + 1, 2), np.float32)
  track[-1] = (x1, y1)
  py, px = y1, x1
  for t in range(t_steps - 1, -1, -1):
    k = argmins[t, py, px]
    py = int(np.clip(py + k // window - radius, 0, h - 1))
    px = int(np.clip(px + k % window - radius, 0, w - 1))
    track[t] = (px, py)
  return track


def chain_flow(
    flows: np.ndarray, start: Tuple[float, float]
) -> np.ndarray:
  """Forward-chains a point through dense flow (no end constraint).

  Bilinearly samples the flow at the current (sub-pixel) position each
  step; drifts over long horizons — use `interpolate_track` when an end
  annotation exists.

  Args:
    flows: [T-1, H, W, 2] dense flow, (dx, dy).
    start: (x, y) position at frame 0.

  Returns:
    [T, 2] float32 (x, y) positions.
  """
  flows = np.asarray(flows, np.float32)
  t_steps, h, w = flows.shape[:3]
  pos = np.array(start, np.float32)
  out = [pos.copy()]
  for t in range(t_steps):
    x = np.clip(pos[0], 0, w - 1)
    y = np.clip(pos[1], 0, h - 1)
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
    fx, fy = x - x0, y - y0
    f = (
        flows[t, y0, x0] * (1 - fx) * (1 - fy)
        + flows[t, y0, x1] * fx * (1 - fy)
        + flows[t, y1, x0] * (1 - fx) * fy
        + flows[t, y1, x1] * fx * fy
    )
    pos = pos + f
    out.append(pos.copy())
  return np.stack(out)
