"""TAPNext++ VOTS point tracker (folder protocol + support points).

Behavioral parity: tapnet/tapnextpp/votsp2026/{tracker,model,utils}.py. Each
real query point is augmented with a local grid of support points (default 64
within a 32px model-space radius) that are co-tracked through shared
attention and discarded from the outputs. Frames are resized to a square
model resolution (default 512); display <-> model coordinate transforms are
exposed for callers.

The VOT folder protocol (frames_color.txt, query_*.txt -> output_*.txt and
output_*_visible.txt) is implemented without depending on the `vot` toolkit;
query files are expected to contain one "x,y" point per line or a VOT POINT
region string.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence, Tuple

import numpy as np

INPUT_RESOLUTION = 512
N_SUPPORT = 64
SUPPORT_RADIUS = 32.0


def display_to_model(
    points_xy: np.ndarray, disp_h: int, disp_w: int, model_size: int
) -> np.ndarray:
  """[N, 2] (x, y) display pixels -> square model space."""
  scale = np.array(
      [model_size / disp_w, model_size / disp_h], np.float32
  )
  return points_xy.astype(np.float32) * scale


def model_to_display(
    points_xy: np.ndarray, disp_h: int, disp_w: int, model_size: int
) -> np.ndarray:
  scale = np.array(
      [disp_w / model_size, disp_h / model_size], np.float32
  )
  return points_xy.astype(np.float32) * scale


def grid_support_points(n: int, w: float, h: float) -> np.ndarray:
  """n points on an aspect-matched grid spanning [0, w) x [0, h)."""
  if n <= 0:
    return np.zeros((0, 2), np.float32)
  cols = max(1, round(float(np.sqrt(n * w / h))))
  rows = max(1, int(np.ceil(n / cols)))
  xs = (np.arange(cols) + 0.5) * (w / cols)
  ys = (np.arange(rows) + 0.5) * (h / rows)
  gx, gy = np.meshgrid(xs, ys)
  return np.stack([gx.ravel(), gy.ravel()], -1).astype(np.float32)[:n]


def local_support_points(
    query_xy: np.ndarray,
    n_per_query: int,
    radius: float,
    w: int,
    h: int,
) -> np.ndarray:
  """Support grid of n_per_query points around each query, clamped in-frame."""
  if n_per_query <= 0 or len(query_xy) == 0:
    return np.zeros((0, 2), np.float32)
  out = []
  base = grid_support_points(n_per_query, 2 * radius, 2 * radius) - radius
  for q in query_xy:
    pts = base + q[None]
    pts[:, 0] = np.clip(pts[:, 0], 0, w - 1)
    pts[:, 1] = np.clip(pts[:, 1], 0, h - 1)
    out.append(pts.copy())
  return np.concatenate(out, 0).astype(np.float32)


class VotsPointTracker:
  """Streams frames; tracks real queries + hidden support points."""

  def __init__(
      self,
      params,
      config=None,
      input_resolution: int = INPUT_RESOLUTION,
      n_support: int = N_SUPPORT,
      support_radius: float = SUPPORT_RADIUS,
  ):
    import dataclasses

    from tapnet_tpu import inference
    from tapnet_tpu.checkpoints import tapnext_checkpoint

    if config is not None and config.image_size != (
        input_resolution,
        input_resolution,
    ):
      # Running a checkpoint above its training resolution (the reference
      # runs TAPNext++ at 512 from a 256-trained model): bicubically
      # interpolate the learned posembs once at load time.
      new_config = dataclasses.replace(
          config, image_size=(input_resolution, input_resolution)
      )
      params = tapnext_checkpoint.adapt_posembs(params, config, new_config)
      config = new_config
    self.predictor = inference.OnlineTapnextPredictor(params, config)
    self.input_resolution = input_resolution
    self.n_support = n_support
    self.support_radius = support_radius
    self.num_real = 0
    self._shape = None

  def initialize(self, frame_rgb: np.ndarray, query_points_xy: np.ndarray):
    """frame_rgb: [H, W, 3] uint8; query_points_xy: [Q, 2] display (x, y)."""
    h, w = frame_rgb.shape[:2]
    self._shape = (h, w)
    r = self.input_resolution
    model_q = display_to_model(query_points_xy, h, w, r)
    support = local_support_points(
        model_q, self.n_support, self.support_radius, r, r
    )
    all_xy = np.concatenate([model_q, support], axis=0)
    self.num_real = len(model_q)
    queries_tyx = np.concatenate(
        [np.zeros((len(all_xy), 1), np.float32), all_xy[:, ::-1]], axis=-1
    )
    frame = self._preprocess(frame_rgb)
    tracks, vis = self.predictor.init(frame[None, None], queries_tyx[None])
    return self._postprocess(tracks[:, :, 0], vis[:, :, 0, 0] > 0)

  def track(self, frame_rgb: np.ndarray):
    """Returns ([Q, 2] display (x, y), [Q] bool visible) for real queries."""
    frame = self._preprocess(frame_rgb)
    tracks_yx, vis = self.predictor.predict(frame[None])
    return self._postprocess(tracks_yx, vis)

  def _preprocess(self, frame_rgb: np.ndarray) -> np.ndarray:
    import cv2

    r = self.input_resolution
    resized = cv2.resize(frame_rgb, (r, r), interpolation=cv2.INTER_LINEAR)
    return resized.astype(np.float32) / 255.0 * 2.0 - 1.0

  def _postprocess(self, tracks_yx: np.ndarray, vis: np.ndarray):
    h, w = self._shape
    real_yx = np.asarray(tracks_yx)[0, : self.num_real]
    real_vis = np.asarray(vis)[0, : self.num_real]
    xy = model_to_display(
        real_yx[:, ::-1], h, w, self.input_resolution
    )
    return xy, real_vis


def _parse_query_file(path: str) -> np.ndarray:
  """Reads 'x,y' lines or VOT POINT region strings."""
  pts = []
  with open(path) as f:
    for line in f:
      line = line.strip()
      if not line:
        continue
      if line.lower().startswith("point"):
        line = line.split("point", 1)[-1].strip(" :")
      vals = [float(v) for v in line.replace(";", ",").split(",") if v]
      pts.append(vals[:2])
  return np.asarray(pts, np.float32)


def run_folder_protocol(params, config=None, workdir: str = "."):
  """VOT folder protocol: track every query_*.txt over frames_color.txt."""
  import cv2

  with open(os.path.join(workdir, "frames_color.txt")) as f:
    frame_paths = [
        os.path.join(workdir, line.strip()) for line in f if line.strip()
    ]
  query_files = sorted(glob.glob(os.path.join(workdir, "query_*.txt")))

  for qf in query_files:
    tag = os.path.basename(qf)[len("query_"):-len(".txt")]
    queries = _parse_query_file(qf)
    tracker = VotsPointTracker(params, config)

    first = cv2.imread(frame_paths[0])[..., ::-1]
    xy, vis = tracker.initialize(first, queries)
    all_xy, all_vis = [xy], [vis]
    for p in frame_paths[1:]:
      frame = cv2.imread(p)[..., ::-1]
      xy, vis = tracker.track(frame)
      all_xy.append(xy)
      all_vis.append(vis)

    out_xy = np.stack(all_xy)  # [T, Q, 2]
    out_vis = np.stack(all_vis)  # [T, Q]
    with open(os.path.join(workdir, f"output_{tag}.txt"), "w") as f:
      for t in range(out_xy.shape[0]):
        f.write(
            ";".join(f"{x:.2f},{y:.2f}" for x, y in out_xy[t]) + "\n"
        )
    with open(
        os.path.join(workdir, f"output_{tag}_visible.txt"), "w"
    ) as f:
      for t in range(out_vis.shape[0]):
        f.write(";".join(str(int(v)) for v in out_vis[t]) + "\n")
