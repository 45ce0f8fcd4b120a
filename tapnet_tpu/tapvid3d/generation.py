"""TAPVid-3D annotation download / assembly utilities.

Capability parity: tapnet/tapvid3d/annotation_generation/ (gcs_utils +
generate_{adt,pstudio,drivetrack}). The official annotations are distributed
as npz files on GCS; DriveTrack ships complete npz files, while ADT and
PStudio ship annotations that are joined with imagery the user obtains
separately (ADT requires the Aria toolkit and is left to the official
pipeline; PStudio frames are joined here).

All downloads use plain HTTPS (no gcloud dependency).
"""

from __future__ import annotations

import io
import os
import urllib.request
from typing import Iterable, List, Optional, Sequence

import numpy as np

GCS_BASE_URL = "https://storage.googleapis.com/dm-tapnet/tapvid3d"
SOURCES = ("adt", "pstudio", "drivetrack")


def download_file(url: str, dest: str, overwrite: bool = False) -> str:
  """HTTPS download with a temp-file + rename (idempotent)."""
  if os.path.exists(dest) and not overwrite:
    return dest
  os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
  tmp = dest + ".tmp"
  urllib.request.urlretrieve(url, tmp)
  os.replace(tmp, dest)
  return dest


def download_annotations(
    source: str,
    npz_filenames: Sequence[str],
    output_dir: str,
    base_url: str = GCS_BASE_URL,
    verbose: bool = True,
) -> List[str]:
  """Fetches the listed annotation npz files for one data source."""
  if source not in SOURCES:
    raise ValueError(f"Unknown source {source!r}; expected one of {SOURCES}")
  paths = []
  for i, name in enumerate(npz_filenames):
    url = f"{base_url}/{source}/{name}"
    dest = os.path.join(output_dir, source, name)
    paths.append(download_file(url, dest))
    if verbose:
      print(f"[{i + 1}/{len(npz_filenames)}] {name}")
  return paths


def join_pstudio_frames(
    annotation_npz: str,
    frames_dir: str,
    output_npz: str,
    jpeg_quality: int = 95,
) -> str:
  """Joins a PStudio annotation npz (tracks/visibility/intrinsics + frame
  names) with user-downloaded frames into a complete example npz."""
  import cv2

  with np.load(annotation_npz, allow_pickle=True) as z:
    data = {k: z[k] for k in z.files}

  frame_names = data.pop("images_jpeg_names", None)
  if frame_names is None:
    # Annotation already contains imagery.
    np.savez(output_npz, **data)
    return output_npz

  jpegs = []
  for name in frame_names:
    path = os.path.join(frames_dir, str(name))
    img = cv2.imread(path)
    if img is None:
      raise FileNotFoundError(path)
    ok, buf = cv2.imencode(
        ".jpg", img, [int(cv2.IMWRITE_JPEG_QUALITY), jpeg_quality]
    )
    if not ok:
      raise ValueError(f"JPEG encode failed for {path}")
    jpegs.append(buf.tobytes())

  data["images_jpeg_bytes"] = np.array(jpegs, object)
  np.savez(output_npz, **data)
  return output_npz


def verify_example(npz_path: str) -> dict:
  """Sanity-checks a TAPVid-3D example npz; returns its shape summary."""
  with np.load(npz_path, allow_pickle=True) as z:
    required = (
        "images_jpeg_bytes",
        "queries_xyt",
        "tracks_XYZ",
        "visibility",
        "fx_fy_cx_cy",
    )
    missing = [k for k in required if k not in z.files]
    if missing:
      raise ValueError(f"{npz_path}: missing keys {missing}")
    t, n = z["tracks_XYZ"].shape[:2]
    if z["visibility"].shape != (t, n):
      raise ValueError(
          f"{npz_path}: visibility {z['visibility'].shape} != {(t, n)}"
      )
    if z["queries_xyt"].shape != (n, 3):
      raise ValueError(
          f"{npz_path}: queries {z['queries_xyt'].shape} != {(n, 3)}"
      )
    if len(z["images_jpeg_bytes"]) != t:
      raise ValueError(f"{npz_path}: frame count != track length")
    return {
        "num_frames": int(t),
        "num_tracks": int(n),
        "intrinsics": z["fx_fy_cx_cy"].tolist(),
    }
