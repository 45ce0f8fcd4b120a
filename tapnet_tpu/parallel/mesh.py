"""Device mesh + sharding helpers.

The reference scales with pmap data-parallelism only
(training/experiment.py:138-139). Here the training step is a single jit over
an explicit 2D Mesh:

  * axis "data": batch parallelism; gradients all-reduce over ICI.
  * axis "model": activation parallelism; the query axis of tracking tensors
    is sharded here, which splits the cost-volume and correlation einsums
    (the memory-dominant tensors) across chips.

Params are replicated (TAPIR is ~30M params; replication is the right
tradeoff on v5e), so the only steady-state collectives are the gradient
reduce over "data" and boundary collectives XLA inserts around query-sharded
ops.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
) -> Mesh:
  """Builds a ("data", "model") mesh over the given (or all) devices."""
  if devices is None:
    devices = jax.devices()
  n = len(devices)
  if n % model_parallel != 0:
    raise ValueError(
        f"{n} devices not divisible by model_parallel={model_parallel}"
    )
  grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
  return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Shard the leading (batch) axis over "data"."""
  return NamedSharding(mesh, P(DATA_AXIS))


def batch_query_sharding(mesh: Mesh) -> NamedSharding:
  """Shard [batch, queries, ...] over ("data", "model")."""
  return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def inference_shardings(mesh: Mesh):
  """Shardings for sharded offline inference of one (or few) long videos.

  Video [B, T, H, W, 3] is sharded over frames ("data" axis holds T):
  feature extraction runs frame-parallel; XLA all-gathers the (small)
  feature grids so the refinement stage can run query-parallel, with
  queries [B, N, 3] sharded over the same devices. Outputs stay
  query-sharded.

  Returns:
    (video_sharding, query_sharding, output_sharding).
  """
  video = NamedSharding(mesh, P(None, DATA_AXIS))
  queries = NamedSharding(mesh, P(None, DATA_AXIS))
  outputs = NamedSharding(mesh, P(None, DATA_AXIS))
  return video, queries, outputs


def shard_batch(batch, mesh: Mesh):
  """Places a host batch dict onto the mesh: video over "data", query-indexed
  tensors over ("data", "model")."""
  query_keys = ("query_points", "target_points", "occluded")

  def place(path, x):
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if name in query_keys:
      return jax.device_put(x, batch_query_sharding(mesh))
    return jax.device_put(x, batch_sharding(mesh))

  return jax.tree_util.tree_map_with_path(place, batch)
