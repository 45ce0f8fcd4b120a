"""Dense many-point tracking with causal TAPIR (RoboTAP front-end).

Behavioral parity: tapnet/robotap/tapir_clustering.py:1023-1179
(track_many_points): sample many query points across frames, extract their
query features from their source frames, then stream the whole video once
through causal TAPIR tracking all points simultaneously.

Simpler than the reference by construction: our causal state is a typed
pytree, so there is no name-keyed "fake causal state" surgery
(tapir_clustering.py:801-853) — features from different query frames are
joined with ordinary array scatters.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.utils import sampling

Array = np.ndarray


def sample_grid_points(
    rng: np.random.RandomState,
    num_frames: int,
    height: int,
    width: int,
    num_points: int,
    query_frames: Optional[Sequence[int]] = None,
) -> Array:
  """Uniformly random (t, y, x) query points (t restricted to query_frames)."""
  if query_frames is None:
    ts = rng.randint(0, num_frames, num_points)
  else:
    ts = np.asarray(query_frames)[
        rng.randint(0, len(query_frames), num_points)
    ]
  ys = rng.rand(num_points) * height
  xs = rng.rand(num_points) * width
  return np.stack([ts, ys, xs], axis=-1).astype(np.float32)


def track_many_points(
    video: Array,
    params,
    config: Optional[tapir_lib.TapirConfig] = None,
    num_points: int = 1024,
    query_frames: Optional[Sequence[int]] = None,
    visibility_threshold: float = 0.5,
    seed: int = 0,
) -> Dict[str, Array]:
  """Densely track `num_points` random queries through a video.

  Args:
    video: [T, H, W, 3] uint8 or float; floats assumed already in [-1, 1].
    params: causal-TAPIR Flax params.
    config: model config (must have use_causal_conv=True).
    num_points: number of random queries.
    query_frames: restrict query sampling to these frames (default: all).
    visibility_threshold: sigmoid threshold on combined logits.
    seed: query sampling seed.

  Returns:
    dict with tracks [N, T, 2] (x, y), visibility [N, T] (predictions before
    a point's query frame are masked invisible), query_points [N, 3],
    video_shape.
  """
  config = config or tapir_lib.causal_tapir_config()
  if not config.use_causal_conv:
    raise ValueError("track_many_points requires a causal config.")
  model = tapir_lib.TAPIR(config=config)

  if video.dtype == np.uint8:
    video_f = video.astype(np.float32) / 255.0 * 2.0 - 1.0
  else:
    video_f = np.asarray(video, np.float32)
  t, h, w = video_f.shape[:3]

  rng = np.random.RandomState(seed)
  query_points = sample_grid_points(rng, t, h, w, num_points, query_frames)
  query_ts = query_points[:, 0].astype(np.int32)

  # --- Query feature extraction, one pass per distinct source frame, with
  # results scattered into shared [1, N, C] banks. Params are jit
  # arguments, not closures — closed-over arrays are inlined into the
  # lowered module as constants.
  @jax.jit
  def frame_query_features(params, frame, pts):
    grids = model.apply(
        {"params": params},
        frame,
        method=tapir_lib.TAPIR.get_feature_grids,
    )
    return model.apply(
        {"params": params},
        frame.shape,
        pts,
        grids,
        method=tapir_lib.TAPIR.get_query_features,
    )

  qf_accum = None
  for frame_id in np.unique(query_ts):
    sel = np.nonzero(query_ts == frame_id)[0]
    pts = query_points[sel].copy()
    pts[:, 0] = 0.0  # relative to the single frame
    qf = frame_query_features(
        params,
        jnp.asarray(video_f[None, frame_id : frame_id + 1]),
        jnp.asarray(pts[None]),
    )
    if qf_accum is None:
      zeros_like_full = jax.tree_util.tree_map(
          lambda x: jnp.zeros(
              (x.shape[0], num_points) + x.shape[2:], x.dtype
          )
          if x.ndim >= 2 and x.shape[1] == len(sel)
          else x,
          qf,
      )
      qf_accum = zeros_like_full
    qf_accum = tapir_lib.QueryFeatures(
        lowres=tuple(
            acc.at[:, jnp.asarray(sel)].set(new)
            for acc, new in zip(qf_accum.lowres, qf.lowres)
        ),
        hires=tuple(
            acc.at[:, jnp.asarray(sel)].set(new)
            for acc, new in zip(qf_accum.hires, qf.hires)
        ),
        resolutions=qf.resolutions,
    )

  # --- Stream the video once, tracking all points.
  @jax.jit
  def step(params, frame, qf, state):
    grids = model.apply(
        {"params": params},
        frame,
        method=tapir_lib.TAPIR.get_feature_grids,
    )
    out = model.apply(
        {"params": params},
        frame.shape[-3:-1],
        grids,
        qf,
        None,
        None,
        state,
        True,
        method=tapir_lib.TAPIR.estimate_trajectories,
    )
    p = config.num_pips_iter
    tracks = jnp.mean(jnp.stack(out["tracks"][p::p]), axis=0)
    occ = jnp.mean(jnp.stack(out["occlusion"][p::p]), axis=0)
    expd = jnp.mean(jnp.stack(out["expected_dist"][p::p]), axis=0)
    visible = sampling.postprocess_occlusions(occ, expd)
    return tracks, visible, out["causal_context"]

  state = model.apply(
      {"params": params},
      1,
      num_points,
      1,
      method=tapir_lib.TAPIR.construct_initial_causal_state,
  )

  all_tracks, all_visible = [], []
  for fr in range(t):
    tracks, visible, state = step(
        params, jnp.asarray(video_f[None, fr : fr + 1]), qf_accum, state
    )
    all_tracks.append(np.asarray(tracks[0, :, 0]))
    all_visible.append(np.asarray(visible[0, :, 0]))

  tracks = np.stack(all_tracks, axis=1)  # [N, T, 2]
  visibility = np.stack(all_visible, axis=1)  # [N, T]
  # Predictions before a point's query frame are extrapolations; hide them.
  frame_ids = np.arange(t)[None, :]
  visibility = visibility & (frame_ids >= query_ts[:, None])

  return {
      "tracks": tracks,
      "visibility": visibility,
      "query_points": query_points,
      "video_shape": np.array(video_f.shape),
  }
