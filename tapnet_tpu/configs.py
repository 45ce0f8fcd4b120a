"""Experiment configuration registry.

Replaces the reference's ml_collections/jaxline config files (configs/*.py)
with typed dataclasses. Hyperparameters follow the reference's locked
configs (file:line cited per preset).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.models import ssm_vit
from tapnet_tpu.models import tapnet as tapnet_lib
from tapnet_tpu.training import optimizers, trainer


@dataclasses.dataclass(frozen=True)
class DataConfig:
  train_size: Tuple[int, int] = (256, 256)
  batch_size: int = 8  # per replica (reference: tapir_config.py:62)
  num_queries: int = 256
  num_frames: int = 24
  color_augment: bool = True
  # TAPNext++ roll/homography camera-jitter augmentation
  # (reference tapnet/tapnextpp/augmentations/{roll,homography}.py).
  geometric_augment: bool = False


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
  name: str
  model_kind: str  # "tapir" | "tapnet" | "tapnext"
  model_config: object
  optimizer: optimizers.OptimizerConfig
  task: trainer.TaskConfig
  data: DataConfig
  total_steps: int
  evaluate_every: int = 10_000
  # TAPNext only: train through time-chunked forward_step scans with
  # jax.checkpoint on each chunk (full BPTT through the carried SSM
  # state). Required when num_frames x ViT-B activations exceed HBM
  # (the tapnextpp long-video preset).
  train_time_chunk: Optional[int] = None

  def build_model(self):
    if self.model_kind == "tapir":
      return tapir_lib.TAPIR(config=self.model_config)
    if self.model_kind == "tapnet":
      return tapnet_lib.TAPNet(config=self.model_config)
    if self.model_kind == "tapnext":
      from tapnet_tpu.models import tapnext

      return tapnext.TAPNextTracker(config=self.model_config)
    raise ValueError(f"Unknown model kind {self.model_kind!r}")

  @property
  def loss_builder(self):
    """Per-model-kind loss for Trainer (None = the default TAPIR loss)."""
    if self.model_kind == "tapnext":
      if self.train_time_chunk:
        import functools

        return functools.partial(
            trainer.tapnext_chunked_loss_builder,
            chunk_size=self.train_time_chunk,
        )
      return trainer.tapnext_loss_builder
    return None


def tapir_experiment(**overrides) -> ExperimentConfig:
  """TAPIR training (reference configs/tapir_config.py:53-96: adam b1=.9
  b2=.95, lr 1e-3 cosine with 1k warmup, wd 0.1, 100k steps, chunk 32)."""
  kwargs = dict(
      name="tapir",
      model_kind="tapir",
      model_config=tapir_lib.tapir_config(),
      optimizer=optimizers.OptimizerConfig(
          base_lr=1e-3,
          adam_b1=0.9,
          adam_b2=0.95,
          weight_decay=1e-1,
          warmup_steps=1000,
          max_norm=-1,
      ),
      task=trainer.TaskConfig(train_chunk_size=32),
      data=DataConfig(),
      total_steps=100_000,
  )
  kwargs.update(overrides)
  return ExperimentConfig(**kwargs)


def tapnet_experiment(**overrides) -> ExperimentConfig:
  """TAP-Net training (reference configs/tapnet_config.py:54-60: lr 2e-3,
  wd 1e-2, 5k warmup)."""
  kwargs = dict(
      name="tapnet",
      model_kind="tapnet",
      model_config=tapnet_lib.TapNetConfig(),
      optimizer=optimizers.OptimizerConfig(
          base_lr=2e-3, weight_decay=1e-2, warmup_steps=5000
      ),
      task=trainer.TaskConfig(train_chunk_size=32),
      data=DataConfig(),
      total_steps=100_000,
  )
  kwargs.update(overrides)
  return ExperimentConfig(**kwargs)


def causal_tapir_experiment(**overrides) -> ExperimentConfig:
  """Causal TAPIR (reference configs/causal_tapir_config.py:78-79)."""
  return tapir_experiment(
      name="causal_tapir",
      model_config=tapir_lib.causal_tapir_config(),
      **overrides,
  )


def bootstapir_experiment(**overrides) -> ExperimentConfig:
  """BootsTAPIR architecture (reference configs/tapir_bootstrap_config.py:
  76-83: extra convs, softmax temperature 10, pyramid level 1)."""
  return tapir_experiment(
      name="bootstapir",
      model_config=tapir_lib.bootstapir_config(),
      **overrides,
  )


def tapnext_experiment(variant: str = "B", **overrides) -> ExperimentConfig:
  """TAPNext (TRecViT-B by default)."""
  kwargs = dict(
      name=f"tapnext_{variant}",
      model_kind="tapnext",
      model_config=ssm_vit.variant_config(variant),
      optimizer=optimizers.OptimizerConfig(
          base_lr=1e-3, weight_decay=1e-1, warmup_steps=1000
      ),
      task=trainer.TaskConfig(),
      data=DataConfig(num_queries=128),
      total_steps=200_000,
  )
  kwargs.update(overrides)
  return ExperimentConfig(**kwargs)


def tapnextpp_experiment(variant: str = "B", **overrides) -> ExperimentConfig:
  """TAPNext++ long-video fine-tune recipe.

  The reference ships the result of this recipe but not the loop
  (tapnet/tapnextpp/README.md:9-16: fine-tuned from TAPNext on 1024-frame
  sequences with roll/homography camera-jitter augmentations). Here the
  recipe exists as a preset: long clips, geometric + color augmentation,
  a fine-tune learning rate with short warmup, and fewer steps. Start from
  a converted TAPNext checkpoint via --checkpoint_dir / restore_or_init.
  """
  kwargs = dict(
      name=f"tapnextpp_{variant}",
      model_kind="tapnext",
      # remat: long-clip chunked backward needs per-layer rematerialization
      # on top of the per-chunk checkpoint (measured: without it one
      # chunk's backward alone exceeds HBM at ViT-B/128 frames).
      model_config=ssm_vit.variant_config(variant, remat=True),
      optimizer=optimizers.OptimizerConfig(
          base_lr=1e-4, weight_decay=1e-1, warmup_steps=500
      ),
      task=trainer.TaskConfig(),
      # 1024-frame clips: the SSM is recurrent over time, attention
      # per-frame, so activation memory is linear in T; batch 1 per replica.
      data=DataConfig(
          num_frames=1024,
          num_queries=64,
          batch_size=1,
          geometric_augment=True,
      ),
      # Full-T backward of ViT-B at 1024 frames needs ~20 GB of layer
      # activations (> v5e HBM): train through 128-frame chunked
      # forward_step scans with per-chunk jax.checkpoint (full BPTT via
      # the carried SSM state; see trainer.tapnext_chunked_loss_builder).
      # Measured at the preset's own shape in PERFORMANCE.md (r5).
      train_time_chunk=128,
      total_steps=20_000,
      evaluate_every=2_000,
  )
  kwargs.update(overrides)
  return ExperimentConfig(**kwargs)


REGISTRY = {
    "tapir": tapir_experiment,
    "tapnet": tapnet_experiment,
    "causal_tapir": causal_tapir_experiment,
    "bootstapir": bootstapir_experiment,
    "tapnext": tapnext_experiment,
    "tapnextpp": tapnextpp_experiment,
}


def get_experiment(name: str, **overrides) -> ExperimentConfig:
  if name not in REGISTRY:
    raise ValueError(
        f"Unknown experiment {name!r}; choices: {sorted(REGISTRY)}"
    )
  return REGISTRY[name](**overrides)
