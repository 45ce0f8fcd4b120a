"""BootsTAP self-training recipe tests (training/bootstrap.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.data import synthetic
from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.parallel import mesh as mesh_lib
from tapnet_tpu.training import bootstrap, optimizers

TINY = tapir_lib.TapirConfig(
    num_mixer_blocks=2,
    num_pips_iter=2,
    pyramid_level=0,
    initial_resolution=(32, 32),
    blocks_per_group=(1, 1, 1, 1),
)


def tiny_setup(num_queries=8):
  model = tapir_lib.TAPIR(config=TINY)
  batch = next(
      synthetic.batch_iterator(
          seed=0, batch_size=4, num_frames=3, height=32, width=32,
          num_queries=4,
      )
  )
  video = batch["video"]
  params = model.init(
      {"params": jax.random.PRNGKey(0),
       "permutation": jax.random.PRNGKey(1)},
      video,
      jnp.zeros((4, 4, 3)),
      query_chunk_size=4,
      is_training=True,
  )["params"]
  cfg = bootstrap.BootstrapConfig(
      num_queries=num_queries, query_chunk_size=4
  )
  return model, params, video, cfg


class TestViewTransform:

  def test_warp_moves_content_with_points(self):
    # A bright dot at a known position must land where the point mapping
    # says after the scale+translate warp.
    video = np.zeros((1, 2, 32, 32, 3), np.float32)
    y0, x0 = 12, 20
    video[:, :, y0 - 1 : y0 + 2, x0 - 1 : x0 + 2] = 1.0
    scale = jnp.asarray([0.8])
    tx = jnp.asarray([3.0])
    ty = jnp.asarray([5.0])
    warped = np.asarray(
        bootstrap._warp_video(jnp.asarray(video), scale, tx, ty)
    )
    ym = (y0 + 0.5) * 0.8 + 5.0
    xm = (x0 + 0.5) * 0.8 + 3.0
    patch = warped[0, 0, int(ym) - 2 : int(ym) + 3,
                   int(xm) - 2 : int(xm) + 3]
    assert patch.max() > 0.3, "dot not found at the mapped position"
    # And far-away regions stay dark.
    assert warped[0, 0, :4, :4].max() < 1e-3


class TestBootstrapStep:

  def test_identity_view_gives_zero_position_loss(self):
    # scale=1, no translation, no color noise, student == teacher: the
    # student sees exactly what the teacher saw, so the position
    # consistency term must vanish.
    model, params, video, _ = tiny_setup()
    cfg = bootstrap.BootstrapConfig(
        num_queries=8, query_chunk_size=4, min_scale=1.0,
        color_augment=False,
    )
    tx = optimizers.make_optimizer(
        optimizers.OptimizerConfig(base_lr=0.0, warmup_steps=1),
        lambda _: 0.0,
    )
    state = bootstrap.init_bootstrap_state(params, tx)
    step = bootstrap.make_bootstrap_train_step(model, tx, cfg)
    _, scalars = step(state, {"video": video}, jax.random.PRNGKey(0))
    assert float(scalars["position_loss"]) < 1e-4
    assert float(scalars["supervised_frac"]) >= 0.0

  def test_sharded_steps_update_student_and_teacher(self):
    model, params, video, cfg = tiny_setup()
    opt = optimizers.OptimizerConfig(
        base_lr=1e-3, warmup_steps=1, weight_decay=0.0
    )
    tx = optimizers.make_optimizer(
        opt, optimizers.make_lr_schedule(opt, 10)
    )
    # Open the confidence gate: a random-weight teacher marks ~everything
    # occluded, which (correctly) zeroes the supervision weight and the
    # gradients; the update-mechanics test needs a nonzero loss.
    cfg = bootstrap.BootstrapConfig(
        num_queries=8, query_chunk_size=4, ema_decay=0.5,
        confidence_gate=1e9,
    )
    mesh = mesh_lib.make_mesh(model_parallel=2)
    state = bootstrap.init_bootstrap_state(params, tx)
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    step = bootstrap.jit_bootstrap_step(
        bootstrap.make_bootstrap_train_step(model, tx, cfg), mesh
    )
    batch = mesh_lib.shard_batch({"video": video}, mesh)
    # Snapshot BEFORE the steps: the jitted step donates its state, which
    # deletes the input buffers. Two steps: warmup makes lr 0 at step 0.
    leaf = lambda p: jax.tree_util.tree_leaves(p)[0]
    s0 = np.asarray(leaf(state.params))
    state1, _ = step(state, batch, jax.random.PRNGKey(0))
    t1 = np.asarray(leaf(state1.teacher_params))
    state2, scalars = step(
        state1, mesh_lib.shard_batch({"video": video}, mesh),
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(scalars["loss"]))
    assert float(scalars["supervised_frac"]) > 0.5
    assert float(scalars["gradient_norm"]) > 0.0
    assert int(state2.step) == 2
    # Student moved; teacher followed by EMA (decay 0.5 -> halfway).
    s2 = leaf(state2.params)
    t2 = leaf(state2.teacher_params)
    assert float(jnp.abs(np.asarray(s2) - s0).max()) > 0.0
    np.testing.assert_allclose(
        np.asarray(t2), 0.5 * t1 + 0.5 * np.asarray(s2), rtol=1e-5,
        atol=1e-7,
    )

  def test_fit_bootstrap_runs(self):
    model, params, video, cfg = tiny_setup()
    opt = optimizers.OptimizerConfig(
        base_lr=1e-4, warmup_steps=1, weight_decay=0.0
    )
    tx = optimizers.make_optimizer(
        opt, optimizers.make_lr_schedule(opt, 4)
    )
    state = bootstrap.init_bootstrap_state(params, tx)

    def data():
      while True:
        yield {"video": video}

    state = bootstrap.fit_bootstrap(
        model, state, data(), tx, num_steps=2, config=cfg,
        mesh=mesh_lib.make_mesh(model_parallel=2), log_every=0,
    )
    assert int(state.step) == 2


def test_fit_bootstrap_telemetry_checkpoint_resume(tmp_path):
  """fit_bootstrap must log through the JSONL telemetry sink and take
  checkpoints a later run can resume from (r4 gap: print-only logging,
  no checkpoint hook)."""
  import json

  model, params, video, cfg = tiny_setup()
  opt = optimizers.OptimizerConfig(
      base_lr=1e-4, warmup_steps=1, weight_decay=0.0
  )
  tx = optimizers.make_optimizer(opt, optimizers.make_lr_schedule(opt, 4))
  ckpt = str(tmp_path / "boot.npy")
  mesh = mesh_lib.make_mesh(model_parallel=2)

  def data():
    while True:
      yield {"video": video}

  evals = []

  def eval_fn(state):
    evals.append(int(state.step))
    return {"average_jaccard": 0.5}

  state = bootstrap.restore_or_init_bootstrap(params, tx, ckpt)
  state = bootstrap.fit_bootstrap(
      model, state, data(), tx, num_steps=2, config=cfg, mesh=mesh,
      log_every=1, checkpoint_path=ckpt, checkpoint_every=2,
      eval_fn=eval_fn, evaluate_every=2,
  )
  assert evals == [2]
  log = tmp_path / "train_log.jsonl"
  records = [json.loads(l) for l in log.read_text().splitlines()]
  kinds = {r["kind"] for r in records}
  assert "bootstrap" in kinds and "eval" in kinds
  assert any("supervised_frac" in r for r in records)

  # Resume: picks up step, student AND teacher from the checkpoint.
  resumed = bootstrap.restore_or_init_bootstrap(params, tx, ckpt)
  assert int(resumed.step) == 2
  leaf = lambda p: np.asarray(jax.tree_util.tree_leaves(p)[0])
  np.testing.assert_array_equal(leaf(resumed.params),
                                leaf(state.params))
  np.testing.assert_array_equal(leaf(resumed.teacher_params),
                                leaf(state.teacher_params))
  resumed = jax.device_put(resumed, mesh_lib.replicated(mesh))
  resumed = bootstrap.fit_bootstrap(
      model, resumed, data(), tx, num_steps=1, config=cfg, mesh=mesh,
      log_every=0,
  )
  assert int(resumed.step) == 3


def test_cotraining_supervised_anchor(tmp_path):
  """BootsTAP proper mixes labeled supervision with the unlabeled
  consistency loss (reference README.md:13). A batch carrying a
  "labeled" sub-batch must add the supervised TAPIR loss and report it."""
  from tapnet_tpu.data import synthetic as synth

  model, params, video, cfg = tiny_setup()
  cfg = bootstrap.BootstrapConfig(
      num_queries=8, query_chunk_size=4, ema_decay=0.5,
      confidence_gate=1e9, supervised_weight=1.0,
      supervised_chunk_size=4,
  )
  opt = optimizers.OptimizerConfig(
      base_lr=1e-4, warmup_steps=1, weight_decay=0.0
  )
  tx = optimizers.make_optimizer(opt, optimizers.make_lr_schedule(opt, 4))
  mesh = mesh_lib.make_mesh(model_parallel=2)
  labeled = {
      k: np.asarray(v)
      for k, v in synth.make_batch(
          jax.random.PRNGKey(5), video.shape[0], video.shape[1],
          video.shape[2], video.shape[3], 8,
      ).items()
  }

  def data():
    while True:
      yield {"video": video, "labeled": labeled}

  state = bootstrap.init_bootstrap_state(params, tx)
  state = bootstrap.fit_bootstrap(
      model, state, data(), tx, num_steps=2, config=cfg, mesh=mesh,
      log_every=1, log_path=str(tmp_path / "log.jsonl"),
  )
  assert int(state.step) == 2
  import json

  records = [json.loads(l) for l in open(tmp_path / "log.jsonl")]
  assert any("supervised_loss" in r for r in records)
  assert all(np.isfinite(r.get("supervised_loss", 0.0)) for r in records)
