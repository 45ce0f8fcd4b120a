"""User-facing TAPIR inference wrappers.

`TapirPredictor` is the convenience API replacing the reference's
`ParameterizedTAPIR` (tapir_model.py:1206-1269): it binds params to the model
and exposes jitted tracking calls. Designed for TPU serving:

  * Shape bucketing: query count (and optionally frame count) are padded up
    to fixed buckets so repeated calls with ragged sizes reuse one compiled
    executable instead of recompiling per video.
  * Online streaming (`OnlineTapirPredictor`) keeps typed causal state and
    per-frame jitted init/predict functions, mirroring the reference live
    demo loop (live_demo.py:51-77) with state resident on device.
"""

from __future__ import annotations

import functools
from typing import Any, Iterable, Iterator, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.utils import sampling

Array = jnp.ndarray


def _round_up(x: int, multiple: int) -> int:
  return -(-x // multiple) * multiple


class TapirPredictor:
  """Binds TAPIR params and exposes jitted, shape-bucketed tracking."""

  def __init__(
      self,
      params: Mapping[str, Any],
      config: Optional[tapir_lib.TapirConfig] = None,
      query_bucket: int = 64,
      frame_bucket: Optional[int] = None,
      query_chunk_size: Optional[int] = 64,
      bfloat16: bool = False,
      mesh: Optional[Any] = None,
      refinement_resolutions: Optional[Sequence[Tuple[int, int]]] = None,
  ):
    """Args:
      params: Flax params (e.g. from checkpoints.load_tapir_checkpoint).
      config: model configuration.
      query_bucket: queries are padded up to a multiple of this.
      frame_bucket: if set, frames are padded (by repeating the last frame)
        up to a multiple of this, bounding the number of compiled variants.
        NOTE: the refinement mixer is temporal and (offline) bidirectional,
        so a padded tail can shift predictions slightly — keep clip lengths
        bucket-aligned when exact reproducibility matters.
      query_chunk_size: memory-bounding chunk inside the model.
      bfloat16: run backbone / correlations / mixer in bf16 (fp32
        accumulations and heads). ~3-4x faster on TPU; positions typically
        shift by well under a pixel.
      mesh: optional jax.sharding.Mesh for multi-chip inference: frames are
        sharded for feature extraction and queries for refinement
        (parallel/mesh.py inference_shardings); params are replicated.
        Query counts must then be divisible by the device count — tune
        `query_bucket` accordingly.
      refinement_resolutions: override the per-iteration refinement
        resolution ladder (default: log-spaced from 256 up to the video
        size, matching the reference). The speed/quality knob for
        high-resolution videos: e.g. [(480, 480)] runs num_pips_iter
        iterations at the final resolution only, halving refinement cost
        at 480p.
    """
    import dataclasses as _dc

    config = config or tapir_lib.TapirConfig()
    if bfloat16:
      config = _dc.replace(config, compute_dtype="bfloat16")
      params = jax.tree_util.tree_map(
          lambda x: x.astype(jnp.bfloat16)
          if hasattr(x, "astype") and x.dtype == jnp.float32
          else x,
          params,
      )
    self.model = tapir_lib.TAPIR(config=config)
    self.params = params
    self.mesh = mesh
    if mesh is not None:
      # Sharded axes must be divisible by the device count: pad frames and
      # queries up to mesh multiples.
      n_dev = int(np.prod(mesh.devices.shape))
      query_bucket = _round_up(query_bucket, n_dev)
      frame_bucket = _round_up(frame_bucket or 1, n_dev)
    self.query_bucket = query_bucket
    self.frame_bucket = frame_bucket
    self.query_chunk_size = query_chunk_size
    self.refinement_resolutions = (
        None
        if refinement_resolutions is None
        else [tuple(r) for r in refinement_resolutions]
    )

  @functools.cached_property
  def _jitted_forward_impl(self):
    # Params are an explicit argument (not a closure): closed-over arrays
    # are baked into the lowered module as constants, which bloats the
    # serialized HLO by the full parameter size and defeats the
    # compilation cache.
    def fwd(params, video, query_points, chunk):
      return self.model.apply(
          {"params": params},
          video,
          query_points,
          query_chunk_size=chunk,
          refinement_resolutions=self.refinement_resolutions,
      )

    if self.mesh is None:
      return jax.jit(fwd, static_argnums=(3,))

    from jax.sharding import NamedSharding, PartitionSpec

    from tapnet_tpu.parallel import mesh as mesh_lib

    video_s, query_s, out_s = mesh_lib.inference_shardings(self.mesh)
    replicated = NamedSharding(self.mesh, PartitionSpec())
    return jax.jit(
        fwd,
        static_argnums=(3,),
        in_shardings=(replicated, video_s, query_s),
        out_shardings=out_s,
    )

  def _jitted_forward(self, video, query_points, chunk):
    return self._jitted_forward_impl(self.params, video, query_points, chunk)

  def __call__(
      self, video: Array, query_points: Array
  ) -> Mapping[str, np.ndarray]:
    """Track `query_points` (t, y, x raster) through `video` ([-1,1] floats).

    Returns numpy arrays: tracks [B, N, T, 2], occlusion / expected_dist
    logits [B, N, T].
    """
    video = jnp.asarray(video)
    query_points = jnp.asarray(query_points, jnp.float32)
    b, n = query_points.shape[:2]
    t = video.shape[1]

    n_pad = _round_up(max(n, 1), self.query_bucket)
    if n_pad != n:
      pad = jnp.zeros((b, n_pad - n, 3), query_points.dtype)
      query_points_in = jnp.concatenate([query_points, pad], axis=1)
    else:
      query_points_in = query_points

    t_pad = t
    if self.frame_bucket is not None:
      t_pad = _round_up(t, self.frame_bucket)
    if t_pad != t:
      tail = jnp.repeat(video[:, -1:], t_pad - t, axis=1)
      video_in = jnp.concatenate([video, tail], axis=1)
    else:
      video_in = video

    chunk = self.query_chunk_size or n_pad
    out = self._jitted_forward(video_in, query_points_in, min(chunk, n_pad))
    return {
        "tracks": np.asarray(out["tracks"][:, :n, :t]),
        "occlusion": np.asarray(out["occlusion"][:, :n, :t]),
        "expected_dist": np.asarray(out["expected_dist"][:, :n, :t]),
    }

  def visibles(self, out: Mapping[str, np.ndarray]) -> np.ndarray:
    """Boolean visibility from occlusion + uncertainty logits."""
    return np.asarray(
        sampling.postprocess_occlusions(
            jnp.asarray(out["occlusion"]), jnp.asarray(out["expected_dist"])
        )
    )

  def track_many(
      self, inputs: Iterable[Tuple[Array, Array]]
  ) -> Iterator[Mapping[str, np.ndarray]]:
    """Pipelined multi-video tracking: yields one result dict per
    (video, query_points) item, in order.

    Dispatch is asynchronous, so while the device tracks video i the host
    is already decoding / transferring video i+1 (double-buffered ingest —
    the host->device copy and the next item's preparation overlap the
    current item's compute). Results are materialized to numpy one step
    behind the dispatch, which is when the device work has typically
    already finished.

    Shapes are bucketed per `query_bucket` / `frame_bucket`, so feeding
    videos of aligned lengths avoids recompiles.
    """

    def _dispatch(video, query_points):
      video = jnp.asarray(video)
      query_points = jnp.asarray(query_points, jnp.float32)
      b, n = query_points.shape[:2]
      t = video.shape[1]
      n_pad = _round_up(max(n, 1), self.query_bucket)
      if n_pad != n:
        pad = jnp.zeros((b, n_pad - n, 3), query_points.dtype)
        query_points = jnp.concatenate([query_points, pad], axis=1)
      t_pad = t
      if self.frame_bucket is not None:
        t_pad = _round_up(t, self.frame_bucket)
      if t_pad != t:
        tail = jnp.repeat(video[:, -1:], t_pad - t, axis=1)
        video = jnp.concatenate([video, tail], axis=1)
      chunk = self.query_chunk_size or n_pad
      out = self._jitted_forward(video, query_points, min(chunk, n_pad))
      return out, n, t

    def _materialize(out, n, t):
      return {
          "tracks": np.asarray(out["tracks"][:, :n, :t]),
          "occlusion": np.asarray(out["occlusion"][:, :n, :t]),
          "expected_dist": np.asarray(out["expected_dist"][:, :n, :t]),
      }

    pending = None
    for video, query_points in inputs:
      dispatched = _dispatch(video, query_points)
      if pending is not None:
        yield _materialize(*pending)
      pending = dispatched
    if pending is not None:
      yield _materialize(*pending)


class TapnextPredictor:
  """TAPNext inference wrapper with the TAP-Vid calling convention.

  Bridges conventions: TAP-Vid queries are (t, y, x) with tracks (x, y) —
  TAPNext natively consumes (t, y, x) and emits (y, x), so only the output
  axis order flips. Occlusion logits are negated visibility logits.

  NOTE: unlike TAPIR (whose query chunks are independent), TAPNext query
  tokens attend to each other and to image tokens, so padding the query axis
  CHANGES predictions. Bucketing is therefore off by default; enable it only
  for models trained with query-to-image masking where the approximation is
  acceptable.
  """

  def __init__(
      self,
      params: Mapping[str, Any],
      config=None,
      query_bucket: Optional[int] = None,
      chunk_size: Optional[int] = None,
  ):
    """chunk_size: if set, videos longer than this are processed in
    time-chunks with the SSM cache carried across chunks — mathematically
    identical to the full-sequence forward (the temporal mixer is exactly
    recurrent; attention is per-frame), but with activation memory bounded
    by the chunk. Required for long videos: the full-T forward holds
    per-layer [T, tokens, mlp_dim] activations (1024 frames of ViT-B
    would need ~27 GB for one MLP hidden)."""
    from tapnet_tpu.models import ssm_vit, tapnext

    self.model = tapnext.TAPNextTracker(
        config=config or ssm_vit.SsmVitConfig()
    )
    self.params = params
    self.query_bucket = query_bucket
    self.chunk_size = chunk_size

  @functools.cached_property
  def _jitted_forward(self):
    # Params as an argument, not a closure (closure arrays become inlined
    # HLO constants — a ViT-B adds ~400 MB to the serialized module).
    @jax.jit
    def fwd(params, video, query_points):
      out = self.model.apply({"params": params}, video, query_points)
      return out.tracks, out.visible_logits

    return fwd

  @functools.cached_property
  def _jitted_warmup(self):
    from tapnet_tpu.models import tapnext

    @jax.jit
    def f(params, frames, query_points):
      res = self.model.apply(
          {"params": params}, frames, query_points,
          method=tapnext.TAPNextTracker.forward_step,
      )
      return res.tracks, res.visible_logits, res.state

    return f

  @functools.cached_property
  def _jitted_chunk(self):
    from tapnet_tpu.models import tapnext

    @jax.jit
    def f(params, frames, state):
      res = self.model.apply(
          {"params": params}, frames, None, None, state,
          method=tapnext.TAPNextTracker.forward_step,
      )
      return res.tracks, res.visible_logits, res.state

    return f

  def _forward_chunked(self, video, query_points):
    """Time-chunked forward with the recurrent state carried; returns the
    same (tracks, visible_logits) as the full-sequence forward."""
    c = self.chunk_size
    t = video.shape[1]
    pad_t = -t % c
    if pad_t:
      tail = jnp.repeat(video[:, -1:], pad_t, axis=1)
      video = jnp.concatenate([video, tail], axis=1)
    tracks, vis, state = self._jitted_warmup(
        self.params, video[:, :c], query_points
    )
    tracks_all, vis_all = [tracks], [vis]
    for start in range(c, video.shape[1], c):
      tracks, vis, state = self._jitted_chunk(
          self.params, video[:, start : start + c], state
      )
      tracks_all.append(tracks)
      vis_all.append(vis)
    # Chunks come back [B, Q, T_c, ...] (the offline convention already);
    # concatenate over time and drop tail padding.
    tracks = jnp.concatenate(tracks_all, axis=2)[:, :, :t]
    vis = jnp.concatenate(vis_all, axis=2)[:, :, :t]
    return tracks, vis

  def __call__(
      self, video: Array, query_points: Array
  ) -> Mapping[str, np.ndarray]:
    video = jnp.asarray(video)
    query_points = jnp.asarray(query_points, jnp.float32)
    b, n = query_points.shape[:2]
    if self.query_bucket is not None:
      n_pad = _round_up(max(n, 1), self.query_bucket)
      if n_pad != n:
        pad = jnp.zeros((b, n_pad - n, 3), query_points.dtype)
        query_points = jnp.concatenate([query_points, pad], axis=1)
    if self.chunk_size is not None and video.shape[1] > self.chunk_size:
      tracks_yx, visible_logits = self._forward_chunked(video, query_points)
    else:
      tracks_yx, visible_logits = self._jitted_forward(
          self.params, video, query_points
      )
    tracks_xy = np.asarray(tracks_yx)[:, :n, :, ::-1]
    occ_logits = -np.asarray(visible_logits)[:, :n, :, 0]
    return {
        "tracks": tracks_xy,
        "occlusion": occ_logits,
        "expected_dist": None,
    }


class OnlineTapnextPredictor:
  """Streaming TAPNext: warm-up on the first frame(s) with queries, then
  one jitted step per frame with the typed TAPNextTrackingState."""

  def __init__(self, params: Mapping[str, Any], config=None):
    from tapnet_tpu.models import ssm_vit, tapnext

    self.model = tapnext.TAPNextTracker(
        config=config or ssm_vit.SsmVitConfig()
    )
    self.params = params
    self._state = None

  @functools.cached_property
  def _jitted_init(self):
    from tapnet_tpu.models import tapnext

    # Params as an argument, not a closure (closure arrays become inlined
    # HLO constants — a ViT-B adds ~400 MB to the serialized module).
    @jax.jit
    def f(params, frames, query_points):
      res = self.model.apply(
          {"params": params},
          frames,
          query_points,
          method=tapnext.TAPNextTracker.forward_step,
      )
      return res.tracks, res.visible_logits, res.state

    return f

  @functools.cached_property
  def _jitted_step(self):
    from tapnet_tpu.models import tapnext

    @jax.jit
    def f(params, frame, state):
      res = self.model.apply(
          {"params": params},
          frame,
          None,
          None,
          state,
          method=tapnext.TAPNextTracker.forward_step,
      )
      return res.tracks, res.visible_logits, res.state

    return f

  def init(self, frames: Array, query_points: Array):
    """frames [B, T0, H, W, 3]; query_points [B, Q, 3] (t, y, x)."""
    tracks, vis, self._state = self._jitted_init(
        self.params, jnp.asarray(frames),
        jnp.asarray(query_points, jnp.float32)
    )
    return np.asarray(tracks), np.asarray(vis)

  def predict(self, frame: Array):
    """One frame [B, H, W, 3] (or [B, 1, H, W, 3]) -> ((y, x) tracks, vis)."""
    if self._state is None:
      raise ValueError("Call init() first.")
    frame = jnp.asarray(frame)
    if frame.ndim == 4:
      frame = frame[:, None]
    tracks, vis, self._state = self._jitted_step(
        self.params, frame, self._state
    )
    return np.asarray(tracks[:, :, 0]), np.asarray(vis[:, :, 0, 0] > 0)


class OnlineTapirPredictor:
  """Streaming TAPIR: per-frame prediction with typed causal state.

  Usage:
    p = OnlineTapirPredictor(params, config_with_use_causal_conv)
    p.init(first_frame, query_points)       # query features + zero state
    for frame in frames:
      tracks, visibles = p.predict(frame)   # one jitted step per frame
  """

  def __init__(
      self,
      params: Mapping[str, Any],
      config: Optional[tapir_lib.TapirConfig] = None,
  ):
    config = config or tapir_lib.TapirConfig(
        use_causal_conv=True, num_pips_iter=4, pyramid_level=1
    )
    if not config.use_causal_conv:
      raise ValueError("Online TAPIR requires use_causal_conv=True.")
    self.model = tapir_lib.TAPIR(config=config)
    self.params = params
    self._query_features = None
    self._state = None
    self._resolution = None

  @functools.cached_property
  def _jitted_init(self):
    # Params as an argument, not a closure (closure arrays become inlined
    # HLO constants in the serialized module).
    @jax.jit
    def init_fn(params, frame, query_points):
      """frame: [B, 1, H, W, 3]; query_points: [B, N, 3] (t, y, x)."""
      grids = self.model.apply(
          {"params": params},
          frame,
          method=tapir_lib.TAPIR.get_feature_grids,
      )
      qf = self.model.apply(
          {"params": params},
          frame.shape,
          query_points,
          grids,
          method=tapir_lib.TAPIR.get_query_features,
      )
      return qf

    return init_fn

  @functools.cached_property
  def _jitted_predict(self):
    @jax.jit
    def predict_fn(params, frame, query_features, state):
      grids = self.model.apply(
          {"params": params},
          frame,
          method=tapir_lib.TAPIR.get_feature_grids,
      )
      out = self.model.apply(
          {"params": params},
          frame.shape[-3:-1],
          grids,
          query_features,
          None,
          None,
          state,
          True,
          method=tapir_lib.TAPIR.estimate_trajectories,
      )
      p = self.model.config.num_pips_iter
      tracks = jnp.mean(jnp.stack(out["tracks"][p::p]), axis=0)
      occ = jnp.mean(jnp.stack(out["occlusion"][p::p]), axis=0)
      expd = jnp.mean(jnp.stack(out["expected_dist"][p::p]), axis=0)
      visibles = sampling.postprocess_occlusions(occ, expd)
      return tracks, visibles, out["causal_context"]

    return predict_fn

  def init(self, frame: Array, query_points: Array) -> None:
    """Extract query features from `frame` ([B, H, W, 3] or [B, 1, H, W, 3])."""
    frame = jnp.asarray(frame)
    if frame.ndim == 4:
      frame = frame[:, None]
    query_points = jnp.asarray(query_points, jnp.float32)
    self._query_features = self._jitted_init(
        self.params, frame, query_points
    )
    b, n = query_points.shape[:2]
    self._state = self.model.apply(
        {"params": self.params},
        b,
        n,
        1,
        method=tapir_lib.TAPIR.construct_initial_causal_state,
    )
    self._resolution = frame.shape[-3:-1]

  def predict(self, frame: Array) -> Tuple[np.ndarray, np.ndarray]:
    """One streaming step. frame: [B, H, W, 3] in [-1, 1]."""
    if self._query_features is None:
      raise ValueError("Call init() before predict().")
    frame = jnp.asarray(frame)
    if frame.ndim == 4:
      frame = frame[:, None]
    tracks, visibles, self._state = self._jitted_predict(
        self.params, frame, self._query_features, self._state
    )
    return np.asarray(tracks[..., 0, :]), np.asarray(visibles[..., 0])

  def add_points(self, frame: Array, query_points: Array,
                 idx: Sequence[int]) -> None:
    """Replace tracked slots `idx` with new query points from `frame`."""
    frame = jnp.asarray(frame)
    if frame.ndim == 4:
      frame = frame[:, None]
    new_qf = self._jitted_init(
        self.params, frame, jnp.asarray(query_points, jnp.float32)
    )
    b = query_points.shape[0]
    fresh = self.model.apply(
        {"params": self.params},
        b,
        len(idx),
        1,
        method=tapir_lib.TAPIR.construct_initial_causal_state,
    )
    self._query_features, self._state = tapir_lib.update_query_features(
        self._query_features, new_qf, idx, self._state, fresh
    )
