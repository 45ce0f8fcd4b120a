"""TAPVid-3D split management.

The benchmark defines minival / full_eval splits as lists of npz filenames
per data source (adt, pstudio, drivetrack). Rather than vendoring the ~4.6k
filename literals (reference: tapvid3d/splits/tapvid3d_splits.py), this
module loads them from text files — one filename per line — looked up as:

  $TAPVID3D_SPLITS_DIR/{source}_{split}.txt

Generate these once from the official release (each line like
`scene_xyz.npz`), or point TAPVID3D_SPLITS_DIR at an existing copy.
"""

from __future__ import annotations

import os
from typing import List

SPLITS_DIR_ENV = "TAPVID3D_SPLITS_DIR"
SOURCES = ("adt", "pstudio", "drivetrack")
SPLITS = ("minival", "full_eval")


def _splits_dir() -> str:
  d = os.environ.get(SPLITS_DIR_ENV)
  if not d:
    raise FileNotFoundError(
        f"Set ${SPLITS_DIR_ENV} to a directory containing "
        "{source}_{split}.txt files (one npz filename per line)."
    )
  return d


def get_split_files(source: str, split: str) -> List[str]:
  if source not in SOURCES:
    raise ValueError(f"Unknown source {source!r}; expected one of {SOURCES}")
  if split not in SPLITS:
    raise ValueError(f"Unknown split {split!r}; expected one of {SPLITS}")
  path = os.path.join(_splits_dir(), f"{source}_{split}.txt")
  with open(path) as f:
    return [line.strip() for line in f if line.strip()]


def get_minival_files(source: str) -> List[str]:
  return get_split_files(source, "minival")


def get_full_eval_files(source: str) -> List[str]:
  return get_split_files(source, "full_eval")
