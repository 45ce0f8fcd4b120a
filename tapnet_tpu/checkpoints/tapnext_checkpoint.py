"""TAPNext checkpoint IO: released flat .npz <-> tapnet_tpu Flax params.

Released TAPNext checkpoints are flat npz files keyed by Flax paths like
``backbone/Transformer/encoderblock_3/ssm_block/recurrent_block/rg_lru/a_param``
(reference: tapnext_torch_utils.py:60-204). Our module tree reproduces those
scopes exactly, so conversion is pure un/flattening.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def unflatten(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
  """{'a/b/c': x} -> {'a': {'b': {'c': x}}}"""
  tree: Dict[str, Any] = {}
  for key, value in flat.items():
    parts = key.split("/")
    node = tree
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)
  return tree


def flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
  out: Dict[str, np.ndarray] = {}
  for k, v in tree.items():
    key = f"{prefix}/{k}" if prefix else k
    if isinstance(v, Mapping):
      out.update(flatten(v, key))
    else:
      out[key] = np.asarray(v)
  return out


def load_tapnext_checkpoint(path: str) -> Dict[str, Any]:
  """Loads a released flat .npz TAPNext checkpoint into Flax params."""
  with np.load(path) as ckpt:
    return unflatten({k: ckpt[k] for k in ckpt.files})


def save_tapnext_checkpoint(path: str, params: Mapping[str, Any]) -> None:
  """Saves Flax params as a released-format flat .npz."""
  np.savez(path, **flatten(params))
