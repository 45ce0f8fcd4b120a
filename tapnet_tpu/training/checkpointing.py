"""Atomic numpy checkpointing for training state.

Equivalent of the reference's NumpyFileCheckpointer
(tapnet/utils/experiment_utils.py:110-180): one pickled .npy dict holding
{params, opt_state, global_step}, written via tmp-file + atomic rename. Works
with sharded arrays (device_get gathers before saving).
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state: Mapping[str, Any]) -> None:
  """Atomically writes a pytree dict of arrays to `path` (.npy pickle)."""
  host_state = jax.tree_util.tree_map(
      lambda x: np.asarray(jax.device_get(x)), state
  )
  tmp = path + "_tmp"
  os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
  with open(tmp, "wb") as f:
    np.save(f, host_state, allow_pickle=True)
  os.replace(tmp, path)


def restore_checkpoint(path: str) -> Optional[Mapping[str, Any]]:
  """Loads a checkpoint dict, or None if it doesn't exist."""
  if not os.path.exists(path):
    return None
  with open(path, "rb") as f:
    return np.load(f, allow_pickle=True).item()
