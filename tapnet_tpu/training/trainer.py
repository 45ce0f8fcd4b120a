"""TAPIR/TAP-Net training: sharded train step and training loop.

Replaces the reference's jaxline Experiment + pmap update
(tapnet/training/experiment.py:123-198) with one jit-compiled step over an
explicit ("data", "model") mesh: batch sharded over "data", query-indexed
tensors additionally over "model", params replicated, gradient all-reduce
inserted by XLA. Loss follows the reference task
(supervised_point_prediction.py:216-253): TAP loss on the final prediction
plus every unrefined refinement iteration.

Cross-replica BatchNorm (reference resnet.py:49, cross_replica_axis='i')
needs no explicit collective here: with the batch sharded over "data" inside
one jit, GSPMD computes batch statistics over the global batch
(tests/test_training.py::TestCrossReplicaBatchNorm).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from types import SimpleNamespace
from typing import Any, Callable, Iterator, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from tapnet_tpu.parallel import mesh as mesh_lib
from tapnet_tpu.training import checkpointing, optimizers, telemetry
from tapnet_tpu.utils import losses as loss_lib

Array = jnp.ndarray


class TrainState(NamedTuple):
  params: Any
  opt_state: Any
  step: Array
  # Non-parameter variable collections (e.g. BatchNorm batch_stats for
  # TAP-Net's TSM backbone); empty dict for stateless models.
  model_state: Any = {}


@dataclasses.dataclass(frozen=True)
class TaskConfig:
  """Supervised point-prediction task settings
  (reference: supervised_point_prediction.py:44-109)."""

  train_chunk_size: int = 32
  position_loss_weight: float = 0.05
  expected_dist_thresh: float = 6.0


def compute_tapir_loss(
    output: Mapping[str, Any],
    batch: Mapping[str, Array],
    task: TaskConfig,
) -> Tuple[Array, Mapping[str, Array]]:
  """TAP loss over the final output and all unrefined iterations."""
  scalars = {}

  def one(tracks, occ, expd):
    return loss_lib.tapnet_loss(
        tracks,
        occ,
        batch["target_points"],
        batch["occluded"],
        batch["video"].shape,
        expected_dist=expd,
        position_loss_weight=task.position_loss_weight,
        expected_dist_thresh=task.expected_dist_thresh,
    )

  huber, occ_l, prob = one(
      output["tracks"], output["occlusion"], output.get("expected_dist")
  )
  loss = huber + occ_l + prob
  scalars["position_loss"] = huber
  scalars["occlusion_loss"] = occ_l
  scalars["prob_loss"] = prob

  for i in range(len(output.get("unrefined_tracks", ()))):
    huber, occ_l, prob = one(
        output["unrefined_tracks"][i],
        output["unrefined_occlusion"][i],
        output["unrefined_expected_dist"][i],
    )
    loss = loss + huber + occ_l + prob
    scalars[f"position_loss_{i}"] = huber
    scalars[f"occlusion_loss_{i}"] = occ_l

  scalars["loss"] = loss
  return loss, scalars


def tapir_loss_builder(model, task: TaskConfig):
  """Default loss for TAPIR/TAP-Net-style cost-volume trackers."""

  def loss_fn(params, model_state, batch, rng):
    variables = {"params": params, **model_state}
    mutable = list(model_state.keys())
    output, new_state = model.apply(
        variables,
        batch["video"],
        batch["query_points"],
        query_chunk_size=task.train_chunk_size,
        is_training=True,
        rngs={"permutation": rng},
        mutable=mutable,
    )
    loss, scalars = compute_tapir_loss(output, batch, task)
    return loss, (scalars, new_state)

  return loss_fn


def tapnext_loss_builder(model, task: TaskConfig):
  """Loss for TAPNext: coordinate CE + Huber + visibility with deep
  supervision. Expects batch target_points as (x, y); converts to the
  model's (y, x) convention."""
  from tapnet_tpu.models import tapnext_losses

  def loss_fn(params, model_state, batch, rng):
    del rng
    results = model.apply(
        {"params": params, **model_state},
        batch["video"],
        batch["query_points"],
    )
    target_yx = batch["target_points"][..., ::-1]
    visible = 1.0 - batch["occluded"]
    loss, scalars = tapnext_losses.tapnext_loss(results, target_yx, visible)
    return loss, (scalars, model_state)

  return loss_fn


def tapnext_chunked_loss_builder(
    model, task: TaskConfig, chunk_size: int = 128
):
  """TAPNext loss over TIME-CHUNKED forwards — the long-video recipe.

  A full-T ViT-B forward at the tapnextpp preset's shape (1024 frames)
  needs ~20 GB of layer activations for backward even with layer remat;
  v5e has 16 GB. This builder runs the video through
  `TAPNextTracker.forward_step` in chunks under `jax.lax.scan`, with
  `jax.checkpoint` on the chunk body: the temporal mixer is exactly
  recurrent (attention is per-frame), so chunked forward == full forward,
  and gradients flow through the carried SSM state — full BPTT, with only
  chunk-boundary states + one chunk's activations live at a time.

  Differences vs the unchunked builder: per-layer deep-supervision heads
  are not available through the streaming path, so the loss covers the
  final heads only (intermediate losses are a training-efficiency aid in
  the reference, not part of the long-video fine-tune objective).
  """
  from tapnet_tpu.models import tapnext_losses

  def loss_fn(params, model_state, batch, rng):
    del rng
    video = batch["video"]
    qp = batch["query_points"]
    b, t = video.shape[:2]
    if t % chunk_size:
      raise ValueError(
          f"num_frames {t} must be a multiple of chunk_size {chunk_size}"
      )
    variables = {"params": params, **model_state}

    def first(params_, frames):
      r = model.apply(
          {"params": params_, **model_state},
          frames,
          qp,
          method=model.forward_step,
      )
      return r.tracks, r.track_logits, r.visible_logits, r.state

    def body(state, frames):
      r = model.apply(
          variables, frames, None, None, state, method=model.forward_step
      )
      return r.state, (r.tracks, r.track_logits, r.visible_logits)

    tracks0, logits0, vis0, state = jax.checkpoint(first)(
        params, video[:, :chunk_size]
    )
    num_rest = t // chunk_size - 1
    if num_rest:
      rest = video[:, chunk_size:].reshape(
          (b, num_rest, chunk_size) + video.shape[2:]
      ).swapaxes(0, 1)
      state, (tracks_r, logits_r, vis_r) = jax.lax.scan(
          jax.checkpoint(body), state, rest
      )

      def join(first_chunk, scanned):
        # [K, B, Q, chunk, ...] -> [B, Q, K*chunk, ...]
        k = scanned.shape[0]
        merged = jnp.moveaxis(scanned, 0, 2).reshape(
            first_chunk.shape[:2]
            + (k * chunk_size,)
            + first_chunk.shape[3:]
        )
        return jnp.concatenate([first_chunk, merged], axis=2)

      tracks = join(tracks0, tracks_r)
      logits = join(logits0, logits_r)
      vis = join(vis0, vis_r)
    else:
      tracks, logits, vis = tracks0, logits0, vis0

    results = SimpleNamespace(
        tracks=tracks,
        track_logits=logits,
        visible_logits=vis,
        intermediate_tracks=[],
        intermediate_track_logits=[],
        intermediate_visible_logits=[],
    )
    target_yx = batch["target_points"][..., ::-1]
    visible = 1.0 - batch["occluded"]
    loss, scalars = tapnext_losses.tapnext_loss(results, target_yx, visible)
    return loss, (scalars, model_state)

  return loss_fn


def contrastive_loss_builder(model, task: TaskConfig,
                             softmax_temperature: float = 10.0):
  """Legacy cost-volume cycle-consistency loss (the original TAP-Net
  baseline algorithm; reference: supervised_point_prediction.py:255-302):
  maximize the log-softmax mass of each query's cost volume at its
  ground-truth trajectory positions, over visible frames."""
  from tapnet_tpu.utils import sampling as sampling_lib
  from tapnet_tpu.utils import transforms as transforms_lib

  def loss_fn(params, model_state, batch, rng):
    del rng
    out, new_state = model.apply(
        {"params": params, **model_state},
        batch["video"],
        batch["query_points"],
        query_chunk_size=task.train_chunk_size,
        is_training=True,
        get_query_feats=True,
        mutable=list(model_state.keys()),
    )
    feature_grid = out["feature_grid"]  # [B, T, h, w, C]
    query_feats = out["query_feats"]  # [B, N, C]
    im_shape = batch["video"].shape

    losses = []
    n = query_feats.shape[1]
    for start in range(0, n, task.train_chunk_size):
      q = query_feats[:, start : start + task.train_chunk_size]
      dots = jnp.einsum("bnc,bthwc->bnthw", q, feature_grid)
      log_softmax = jax.nn.log_softmax(
          dots * softmax_temperature, axis=(2, 3, 4)
      )
      target = transforms_lib.convert_grid_coordinates(
          batch["target_points"][:, start : start + task.train_chunk_size],
          tuple(im_shape)[3:1:-1],
          feature_grid.shape[3:1:-1],
      )
      # Sample the per-frame log-softmax along the GT trajectory (y, x).
      b, nq, t = log_softmax.shape[:3]
      flat = log_softmax.reshape(b * nq * t, *log_softmax.shape[3:])
      pts = target[..., ::-1].reshape(b * nq * t, 1, 2)
      vals = jax.vmap(sampling_lib.sample_grid_2d)(
          flat[..., None], pts
      ).reshape(b, nq, t)
      visible = 1.0 - batch["occluded"][:, start : start + task.train_chunk_size]
      losses.append(jnp.mean(vals * visible, axis=-1))
    loss = -jnp.mean(jnp.concatenate(losses, axis=1))
    return loss, ({"loss": loss, "contrastive_loss": loss}, new_state)

  return loss_fn


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    task: TaskConfig = TaskConfig(),
    loss_builder: Optional[Callable] = None,
) -> Callable[[TrainState, Mapping[str, Array], Array],
              Tuple[TrainState, Mapping[str, Array]]]:
  """Builds the (unjitted) train step; callers jit it with shardings.

  `loss_builder(model, task) -> loss_fn(params, model_state, batch, rng)`
  selects the task (default: the TAPIR supervised point-prediction loss);
  the loss returns `(loss, (scalars, new_model_state))` so stateful models
  (BatchNorm batch_stats) thread their collections through the step.
  """
  loss_fn = (loss_builder or tapir_loss_builder)(model, task)

  def train_step(state: TrainState, batch, rng):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, (scalars, model_state)), grads = grad_fn(
        state.params, state.model_state, batch, rng
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    scalars = dict(scalars)
    scalars["gradient_norm"] = optax.global_norm(grads)
    return (
        TrainState(params, opt_state, state.step + 1, model_state),
        scalars,
    )

  return train_step


class Trainer:
  """Owns model/optimizer/mesh and runs the sharded training loop."""

  def __init__(
      self,
      model,
      optimizer_config: optimizers.OptimizerConfig,
      total_steps: int,
      task: TaskConfig = TaskConfig(),
      mesh=None,
      checkpoint_path: Optional[str] = None,
      checkpoint_every: int = 1000,
      loss_builder: Optional[Callable] = None,
      log_path: Optional[str] = None,
      init_num_frames: Optional[int] = None,
  ):
    """init_num_frames: initialize parameters on a time-slice of the
    example batch (parameters are clip-length-independent). Required for
    long-clip presets trained through the time-chunked builder, where a
    full-length init forward would not fit in HBM."""
    self.model = model
    self.init_num_frames = init_num_frames
    self.task = task
    self.loss_builder = loss_builder
    self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
    self.lr_schedule = optimizers.make_lr_schedule(
        optimizer_config, total_steps
    )
    self.tx = optimizers.make_optimizer(optimizer_config, self.lr_schedule)
    self.total_steps = total_steps
    self.checkpoint_path = checkpoint_path
    self.checkpoint_every = checkpoint_every
    # Scalar telemetry: JSONL next to the checkpoint unless overridden.
    self.log_path = (
        log_path
        if log_path is not None
        else telemetry.default_log_path(checkpoint_path)
    )
    self._compiled_step = None

  def init_state(self, example_batch, seed: int = 42) -> TrainState:
    if (
        self.init_num_frames
        and example_batch["video"].shape[1] > self.init_num_frames
    ):
      example_batch = dict(
          example_batch,
          video=example_batch["video"][:, : self.init_num_frames],
      )
    # Init under jit: eager Flax init materializes every intermediate on
    # device (per-frame attention matrices alone OOM long-clip ViT inits).
    try:
      variables = jax.jit(
          functools.partial(
              self.model.init,
              query_chunk_size=self.task.train_chunk_size,
              is_training=True,
          )
      )(
          {"params": jax.random.PRNGKey(seed),
           "permutation": jax.random.PRNGKey(0)},
          example_batch["video"],
          example_batch["query_points"],
      )
    except TypeError:
      # Models without the cost-volume signature (e.g. TAPNext).
      variables = jax.jit(self.model.init)(
          jax.random.PRNGKey(seed),
          example_batch["video"],
          example_batch["query_points"],
      )
    variables = dict(variables)
    params = variables.pop("params")
    opt_state = self.tx.init(params)
    state = TrainState(
        params, opt_state, jnp.zeros((), jnp.int32), variables
    )
    # Replicate across the mesh.
    return jax.device_put(state, mesh_lib.replicated(self.mesh))

  def restore_or_init(self, example_batch) -> TrainState:
    if self.checkpoint_path:
      ckpt = checkpointing.restore_checkpoint(self.checkpoint_path)
      if ckpt is not None:
        state = TrainState(
            ckpt["params"],
            ckpt["opt_state"],
            jnp.asarray(ckpt["step"]),
            ckpt.get("model_state", {}),
        )
        return jax.device_put(state, mesh_lib.replicated(self.mesh))
    return self.init_state(example_batch)

  def _build_step(self):
    step_fn = make_train_step(
        self.model, self.tx, self.task, self.loss_builder
    )
    repl = mesh_lib.replicated(self.mesh)
    batch_shardings = dict(
        video=mesh_lib.batch_sharding(self.mesh),
        query_points=mesh_lib.batch_query_sharding(self.mesh),
        target_points=mesh_lib.batch_query_sharding(self.mesh),
        occluded=mesh_lib.batch_query_sharding(self.mesh),
    )
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch_shardings, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )

  @property
  def step_fn(self):
    if self._compiled_step is None:
      self._compiled_step = self._build_step()
    return self._compiled_step

  def fit(
      self,
      state: TrainState,
      data: Iterator[Mapping[str, Array]],
      num_steps: int,
      log_every: int = 50,
      rng: Optional[Array] = None,
      eval_fn: Optional[Callable[[TrainState], Mapping[str, float]]] = None,
      evaluate_every: int = 0,
  ) -> TrainState:
    """Runs `num_steps` training steps, logging scalar means.

    If `eval_fn` is given, it is called every `evaluate_every` steps with the
    current state (the reference's in-train eval, experiment.py:193-197).
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    sink = telemetry.ScalarSink(self.log_path)
    last_t = time.time()
    for i in range(num_steps):
      batch = next(data)
      batch = mesh_lib.shard_batch(batch, self.mesh)
      rng, step_rng = jax.random.split(rng)
      state, scalars = self.step_fn(state, batch, step_rng)
      step = int(state.step)
      if log_every and (i + 1) % log_every == 0:
        scalars = jax.device_get(scalars)
        dt = (time.time() - last_t) / log_every
        last_t = time.time()
        lr = float(self.lr_schedule(step))
        parts = [f"step {step} loss {float(scalars['loss']):.4f}"]
        if "position_loss" in scalars:
          parts.append(f"pos {float(scalars['position_loss']):.4f}")
        if "occlusion_loss" in scalars:
          parts.append(f"occ {float(scalars['occlusion_loss']):.4f}")
        parts.append(f"gnorm {float(scalars['gradient_norm']):.3f}")
        parts.append(f"lr {lr:.2e} {dt*1000:.0f} ms/step")
        print(" ".join(parts))
        sink.write(
            step,
            dict(scalars, learning_rate=lr, ms_per_step=dt * 1000),
        )
      if (
          self.checkpoint_path
          and self.checkpoint_every
          and step % self.checkpoint_every == 0
      ):
        checkpointing.save_checkpoint(
            self.checkpoint_path,
            dict(
                params=state.params,
                opt_state=state.opt_state,
                step=step,
                model_state=state.model_state,
            ),
        )
      if eval_fn is not None and evaluate_every and (
          step % evaluate_every == 0
      ):
        eval_scalars = eval_fn(state)
        print(
            "eval @"
            + str(step)
            + " "
            + " ".join(f"{k}={v:.4f}" for k, v in eval_scalars.items())
        )
        sink.write(step, eval_scalars, kind="eval")
    sink.close()
    return state
