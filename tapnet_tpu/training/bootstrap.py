"""BootsTAP self-supervised consistency training (student-teacher).

The reference ships BootsTAPIR checkpoints and describes the method —
"the model is trained to give consistent predictions across different
spatial transformations and corruptions of the video, as well as
different choices of the query points" (reference README.md:13) — but not
the training loop. This module is that recipe, TPU-first:

  * teacher = EMA of the student; predicts tracks on the CLEAN video for
    randomly sampled query points (no labels needed).
  * student sees a spatially transformed (random scale+translate via
    `jax.image.scale_and_translate` — static shapes, jit-friendly) and
    photometrically corrupted view; its queries are the same physical
    points mapped through the transform.
  * loss: Huber between the student's predictions (mapped back to the
    clean frame) and the teacher's, plus BCE of the student's occlusion
    logits toward the teacher's visibility — both masked to points the
    teacher is confident about (visible and in-bounds under the view).
  * one jit over the ("data", "model") mesh, student+teacher+optimizer
    carried in a single donated state.

Typical use: initialize from a supervised TAPIR checkpoint, then
`fit_bootstrap` over an unlabeled video iterator.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Iterator, Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from tapnet_tpu.data import augmentations
from tapnet_tpu.parallel import mesh as mesh_lib

Array = jnp.ndarray


def _huber(pred_xy: Array, target_xy: Array, delta: float = 4.0) -> Array:
  """Per-point-frame Huber on xy error (reference model_utils.py:29)."""
  distsqr = jnp.sum(jnp.square(pred_xy - target_xy), axis=-1)
  dist = jnp.sqrt(distsqr + 1e-12)
  return jnp.where(dist < delta, distsqr / 2, delta * (dist - delta / 2))


@dataclasses.dataclass(frozen=True)
class BootstrapConfig:
  """Self-training hyperparameters."""

  num_queries: int = 128
  query_chunk_size: int = 32
  ema_decay: float = 0.99
  # Student-view spatial transform: scale sampled log-uniformly in
  # [min_scale, 1], translation uniform within bounds.
  min_scale: float = 0.7
  color_augment: bool = True
  huber_weight: float = 0.05
  occlusion_weight: float = 1.0
  # Teacher confidence gate: only points the teacher marks visible (occ
  # logit < gate and expected_dist logit < gate) supervise the student.
  confidence_gate: float = 0.0
  # Weight of the SUPERVISED anchor loss when the batch carries a
  # "labeled" sub-batch (BootsTAP proper mixes the original labeled
  # training data with the unlabeled self-supervision — reference
  # README.md:13; pure self-training on shifted domains was measured to
  # collapse via confirmation bias, scratch/bootstap_demo.py).
  supervised_weight: float = 1.0
  supervised_chunk_size: int = 32


class BootstrapState(NamedTuple):
  params: Any          # student
  teacher_params: Any  # EMA of the student
  opt_state: Any
  step: Array


def _sample_view(rng, batch, height, width, min_scale):
  """Per-example scale+translate view parameters. Returns (scale[B],
  tx[B], ty[B]) mapping clean coords -> view coords (p' = p*s + t)."""
  k1, k2, k3 = jax.random.split(rng, 3)
  log_min = jnp.log(min_scale)
  scale = jnp.exp(
      jax.random.uniform(k1, (batch,), minval=log_min, maxval=0.0)
  )
  # Keep the scaled image inside the frame: translation in
  # [0, (1 - s) * size].
  tx = jax.random.uniform(k2, (batch,)) * (1.0 - scale) * width
  ty = jax.random.uniform(k3, (batch,)) * (1.0 - scale) * height
  return scale, tx, ty


def _warp_video(video, scale, tx, ty):
  """Applies per-example scale+translate to [B, T, H, W, 3]."""
  b, t, h, w, c = video.shape

  def one(v, s, dx, dy):  # v: [T, H, W, 3]
    return jax.image.scale_and_translate(
        v,
        (t, h, w, c),
        spatial_dims=(1, 2),
        scale=jnp.stack([s, s]),
        translation=jnp.stack([dy, dx]),
        method="bilinear",
    )

  return jax.vmap(one)(video, scale, tx, ty)


def _sample_queries(rng, batch, num_queries, num_frames, height, width):
  """Random (t, y, x) queries in the clean frame, [B, N, 3]."""
  kt, ky, kx = jax.random.split(rng, 3)
  t = jax.random.randint(
      kt, (batch, num_queries), 0, num_frames
  ).astype(jnp.float32)
  y = jax.random.uniform(ky, (batch, num_queries)) * height
  x = jax.random.uniform(kx, (batch, num_queries)) * width
  return jnp.stack([t, y, x], axis=-1)


def make_bootstrap_train_step(
    model,
    tx: optax.GradientTransformation,
    config: BootstrapConfig = BootstrapConfig(),
):
  """Builds the (unjitted) self-training step over unlabeled video.

  batch: {"video": [B, T, H, W, 3] in [-1, 1]}. Returns
  (new_state, scalars).
  """

  def train_step(state: BootstrapState, batch, rng):
    video = batch["video"]
    b, t, h, w, _ = video.shape
    k_view, k_query, k_color = jax.random.split(rng, 3)

    # Teacher on the clean video (no gradient).
    qp = _sample_queries(k_query, b, config.num_queries, t, h, w)
    teacher = model.apply(
        {"params": state.teacher_params},
        video,
        qp,
        query_chunk_size=config.query_chunk_size,
    )
    t_tracks = jax.lax.stop_gradient(teacher["tracks"])  # [B, N, T, 2] xy
    t_occ = jax.lax.stop_gradient(teacher["occlusion"])
    t_expd = jax.lax.stop_gradient(
        teacher.get("expected_dist", jnp.zeros_like(t_occ))
    )

    # Student view: scale+translate + color corruption; queries mapped.
    scale, tx_, ty_ = _sample_view(k_view, b, h, w, config.min_scale)
    video_s = _warp_video(video, scale, tx_, ty_)
    if config.color_augment:
      video_s = jax.vmap(augmentations.color_augmentation)(
          jax.random.split(k_color, b), video_s
      )
    s_b = scale[:, None, None]
    qp_s = jnp.stack(
        [
            qp[..., 0],
            qp[..., 1] * s_b[..., 0] + ty_[:, None],
            qp[..., 2] * s_b[..., 0] + tx_[:, None],
        ],
        axis=-1,
    )

    # Teacher targets mapped into the view (x, y order).
    target_xy = (
        t_tracks * scale[:, None, None, None]
        + jnp.stack([tx_, ty_], -1)[:, None, None]
    )
    # Supervise only teacher-confident, in-view points.
    conf = (t_occ < config.confidence_gate) & (
        t_expd < config.confidence_gate
    )
    inb = (
        (target_xy[..., 0] >= 0)
        & (target_xy[..., 0] < w)
        & (target_xy[..., 1] >= 0)
        & (target_xy[..., 1] < h)
    )
    weight = (conf & inb).astype(jnp.float32)  # [B, N, T]

    def loss_fn(params):
      out = model.apply(
          {"params": params},
          video_s,
          qp_s,
          query_chunk_size=config.query_chunk_size,
          is_training=True,
      )
      denom = jnp.maximum(weight.sum(), 1.0)
      total = 0.0
      scalars = {}
      if "labeled" in batch:
        # Supervised anchor on labeled data (co-training, as in BootsTAP
        # proper): the TAPIR point-prediction loss on the student.
        from tapnet_tpu.training import trainer as trainer_lib

        lb = batch["labeled"]
        sup_out = model.apply(
            {"params": params},
            lb["video"],
            lb["query_points"],
            query_chunk_size=config.supervised_chunk_size,
            is_training=True,
        )
        sup_loss, _ = trainer_lib.compute_tapir_loss(
            sup_out,
            lb,
            trainer_lib.TaskConfig(
                train_chunk_size=config.supervised_chunk_size
            ),
        )
        total = total + config.supervised_weight * sup_loss
        scalars["supervised_loss"] = sup_loss
      preds = list(out.get("unrefined_tracks", ())) + [out["tracks"]]
      occs = list(out.get("unrefined_occlusion", ())) + [out["occlusion"]]
      for i, (tr, oc) in enumerate(zip(preds, occs)):
        huber = _huber(tr, target_xy)  # [B, N, T]
        pos = config.huber_weight * (huber * weight).sum() / denom
        occ_bce = optax.sigmoid_binary_cross_entropy(
            oc, (t_occ > 0).astype(jnp.float32)
        )
        occ = config.occlusion_weight * (
            occ_bce * weight
        ).sum() / denom
        total = total + pos + occ
        if i == len(preds) - 1:
          scalars["position_loss"] = pos
          scalars["occlusion_loss"] = occ
      scalars["supervised_frac"] = weight.mean()
      return total, scalars

    (loss, scalars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    teacher_params = jax.tree_util.tree_map(
        lambda e, p: config.ema_decay * e + (1.0 - config.ema_decay) * p,
        state.teacher_params,
        params,
    )
    scalars = dict(scalars)
    scalars["loss"] = loss
    scalars["gradient_norm"] = optax.global_norm(grads)
    return (
        BootstrapState(params, teacher_params, opt_state, state.step + 1),
        scalars,
    )

  return train_step


def init_bootstrap_state(
    params, tx: optax.GradientTransformation
) -> BootstrapState:
  """Student and teacher both start from `params` (e.g. a supervised
  TAPIR checkpoint). The teacher is a deep COPY: the train step donates
  its state, and aliased student/teacher buffers would be donated twice."""
  return BootstrapState(
      params=params,
      teacher_params=jax.tree_util.tree_map(jnp.copy, params),
      opt_state=tx.init(params),
      step=jnp.zeros((), jnp.int32),
  )


def jit_bootstrap_step(step_fn, mesh):
  """Jits the step with donated state; shardings follow the operands
  (state is replicated by init/restore, batches are placed by
  mesh_lib.shard_batch — which also handles the optional nested
  "labeled" sub-batch by leaf name)."""
  del mesh
  return jax.jit(step_fn, donate_argnums=(0,))


def restore_or_init_bootstrap(
    params, tx: optax.GradientTransformation,
    checkpoint_path: Optional[str],
) -> BootstrapState:
  """Resumes a self-training run from its checkpoint, else starts from
  `params` (a supervised checkpoint) with teacher = student."""
  from tapnet_tpu.training import checkpointing

  if checkpoint_path:
    ckpt = checkpointing.restore_checkpoint(checkpoint_path)
    if ckpt is not None:
      return BootstrapState(
          ckpt["params"],
          ckpt["teacher_params"],
          ckpt["opt_state"],
          jnp.asarray(ckpt["step"]),
      )
  return init_bootstrap_state(params, tx)


def fit_bootstrap(
    model,
    state: BootstrapState,
    data: Iterator[Mapping[str, Array]],
    tx: optax.GradientTransformation,
    num_steps: int,
    config: BootstrapConfig = BootstrapConfig(),
    mesh=None,
    log_every: int = 50,
    rng: Optional[Array] = None,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 1000,
    log_path: Optional[str] = None,
    eval_fn: Optional[Callable[[BootstrapState], Mapping[str, float]]] = None,
    evaluate_every: int = 0,
) -> BootstrapState:
  """Runs the self-training loop over an unlabeled-video iterator.

  Telemetry goes to the same JSONL sink as supervised training
  (`log_path`, defaulting to `train_log.jsonl` next to the checkpoint);
  `checkpoint_path` enables atomic save/resume of the full
  student+teacher+optimizer state (restore with
  `restore_or_init_bootstrap`). `eval_fn(state)` is the in-train eval
  hook; it receives the state (use `state.params` for the student or
  `state.teacher_params` for the EMA teacher)."""
  from tapnet_tpu.training import checkpointing, telemetry

  mesh = mesh if mesh is not None else mesh_lib.make_mesh()
  step_fn = jit_bootstrap_step(
      make_bootstrap_train_step(model, tx, config), mesh
  )
  # Shardings are operand-driven now: make the state's replication explicit.
  state = jax.device_put(state, mesh_lib.replicated(mesh))
  rng = rng if rng is not None else jax.random.PRNGKey(0)
  sink = telemetry.ScalarSink(
      log_path
      if log_path is not None
      else telemetry.default_log_path(checkpoint_path)
  )
  for i in range(num_steps):
    batch = next(data)
    kept = {"video": batch["video"]}
    if "labeled" in batch:
      kept["labeled"] = dict(batch["labeled"])
    batch = mesh_lib.shard_batch(kept, mesh)
    rng, step_rng = jax.random.split(rng)
    state, scalars = step_fn(state, batch, step_rng)
    step = int(state.step)
    if log_every and (i + 1) % log_every == 0:
      scalars = jax.device_get(scalars)
      print(
          f"step {step} loss {float(scalars['loss']):.4f} "
          f"sup_frac {float(scalars['supervised_frac']):.3f}"
      )
      sink.write(step, scalars, kind="bootstrap")
    if checkpoint_path and checkpoint_every and (
        step % checkpoint_every == 0
    ):
      checkpointing.save_checkpoint(
          checkpoint_path,
          dict(
              params=state.params,
              teacher_params=state.teacher_params,
              opt_state=state.opt_state,
              step=step,
          ),
      )
    if eval_fn is not None and evaluate_every and (
        step % evaluate_every == 0
    ):
      eval_scalars = eval_fn(state)
      print(
          f"eval @{step} "
          + " ".join(f"{k}={v:.4f}" for k, v in eval_scalars.items())
      )
      sink.write(step, eval_scalars, kind="eval")
  sink.close()
  return state
