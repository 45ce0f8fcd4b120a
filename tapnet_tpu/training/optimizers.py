"""Optimizer + LR schedule construction for TAP training.

Behavioral parity: tapnet/utils/experiment_utils.py:31-107 and
tapnet/utils/optimizers.py:24-88 — clip -> adam/sgd -> masked weight decay ->
schedule -> descent, wrapped in apply_if_finite; weight decay skips biases and
normalization parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
  """Reference TAPIR defaults: configs/tapir_config.py:53-96."""

  optimizer: str = "adam"
  base_lr: float = 1e-3
  max_norm: float = -1.0  # <= 0 disables clipping
  weight_decay: float = 1e-1
  adam_b1: float = 0.9
  adam_b2: float = 0.95
  adam_eps: float = 1e-8
  sgd_momentum: float = 0.9
  sgd_nesterov: bool = False
  schedule_type: str = "cosine"
  warmup_steps: int = 1000
  init_value: float = 0.0
  end_value: float = 0.0
  constant_fraction: float = 0.5
  max_consecutive_nonfinite: int = 5
  # Parameters whose path contains any of these substrings get their final
  # update multiplied by `fast_lr_multiplier` (the reference's "fast
  # variables" boost, experiment.py:348-371).
  fast_variables: tuple = ()
  fast_lr_multiplier: float = 10.0


def make_lr_schedule(
    config: OptimizerConfig, total_steps: int
) -> optax.Schedule:
  """Cosine-with-warmup or constant-then-cosine schedules."""
  if config.schedule_type == "cosine":
    # decay_steps counts from step 0 and must exceed the warmup.
    return optax.warmup_cosine_decay_schedule(
        init_value=config.init_value,
        peak_value=config.base_lr,
        warmup_steps=config.warmup_steps,
        decay_steps=max(total_steps, config.warmup_steps + 1),
        end_value=config.end_value,
    )
  if config.schedule_type == "constant_cosine":
    constant_steps = int(config.constant_fraction * total_steps)
    return optax.join_schedules(
        [
            optax.constant_schedule(config.base_lr),
            optax.cosine_decay_schedule(
                init_value=config.base_lr,
                decay_steps=total_steps - constant_steps,
                alpha=config.end_value / config.base_lr,
            ),
        ],
        boundaries=[constant_steps],
    )
  raise ValueError(f"Unknown schedule: {config.schedule_type}")


def weight_decay_mask(params) -> dict:
  """True where weight decay applies: skip biases and norm scales/offsets."""
  no_decay_names = ("bias", "scale", "offset")

  def decide(path, _):
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return name not in no_decay_names

  return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(
    config: OptimizerConfig,
    lr_schedule: optax.Schedule,
    params_example=None,
) -> optax.GradientTransformation:
  """Builds the full optimizer chain."""
  chain = []
  if config.max_norm > 0:
    chain.append(optax.clip_by_global_norm(config.max_norm))
  if config.optimizer == "adam":
    chain.append(
        optax.scale_by_adam(
            b1=config.adam_b1, b2=config.adam_b2, eps=config.adam_eps
        )
    )
  elif config.optimizer == "sgd":
    chain.append(
        optax.trace(
            decay=config.sgd_momentum, nesterov=config.sgd_nesterov
        )
    )
  else:
    raise ValueError(f"Unknown optimizer: {config.optimizer}")

  if config.weight_decay > 0:
    chain.append(
        optax.add_decayed_weights(
            config.weight_decay, mask=weight_decay_mask
        )
    )
  chain.extend([optax.scale_by_schedule(lr_schedule), optax.scale(-1.0)])

  if config.fast_variables:

    def fast_mask(params):
      def decide(path, _):
        names = [
            p.key if hasattr(p, "key") else str(p) for p in path
        ]
        return any(s in n for s in config.fast_variables for n in names)

      return jax.tree_util.tree_map_with_path(decide, params)

    chain.append(
        optax.masked(optax.scale(config.fast_lr_multiplier), fast_mask)
    )

  tx = optax.chain(*chain)
  return optax.apply_if_finite(
      tx, max_consecutive_errors=config.max_consecutive_nonfinite
  )
