"""Run the tapnextpp preset at its OWN shape once (VERDICT r4 item 3).

One real training step — ViT-B, 1024-frame clip, batch 1, geometric
(roll+homography) augmentations on, through the preset's time-chunked BPTT
builder — on the v5e. Reports compile time, steady-state step time, and
device memory stats.

Usage: python scratch/tapnextpp_shape_step.py [--num_frames 1024]
       [--chunk 128] [--steps 3] [--bf16]
"""

import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--num_frames", type=int, default=1024)
  ap.add_argument("--chunk", type=int, default=128)
  ap.add_argument("--steps", type=int, default=3)
  ap.add_argument("--bf16", action="store_true")
  ap.add_argument("--data_dir", default="/tmp/tapnextpp_shape_data")
  args = ap.parse_args()

  import dataclasses
  import os

  from tapnet_tpu import configs
  from tapnet_tpu.data import kubric, synthetic
  from tapnet_tpu.models import ssm_vit
  from tapnet_tpu.training import trainer as trainer_lib

  # One 1024-frame synthetic example in the Kubric npz layout, read through
  # the real training iterator with geometric augs ON (host-side warp).
  marker = os.path.join(
      args.data_dir, f"synth_{0:04d}.npz"
  )
  if not os.path.exists(marker):
    t0 = time.time()
    synthetic.export_npz(
        args.data_dir, 1, seed=77, num_frames=args.num_frames,
        height=256, width=256, num_queries=64,
    )
    print(f"data gen {time.time()-t0:.1f}s", flush=True)

  exp = configs.get_experiment("tapnextpp")
  if args.bf16:
    exp = dataclasses.replace(
        exp,
        model_config=ssm_vit.variant_config(
            "B", compute_dtype="bfloat16", remat=True
        ),
    )
  exp = dataclasses.replace(
      exp,
      data=dataclasses.replace(exp.data, num_frames=args.num_frames),
      train_time_chunk=args.chunk,
  )

  data = kubric.training_iterator(
      args.data_dir,
      batch_size=1,
      train_size=exp.data.train_size,
      num_queries=exp.data.num_queries,
      color_augment=exp.data.color_augment,
      geometric_augment=True,
      seed=0,
  )
  t = trainer_lib.Trainer(
      exp.build_model(),
      exp.optimizer,
      total_steps=100,
      task=exp.task,
      loss_builder=exp.loss_builder,
      init_num_frames=8,
  )
  t0 = time.time()
  batch = next(data)
  jax.block_until_ready(batch)
  print(f"first batch (host augs + device prep) {time.time()-t0:.1f}s",
        flush=True)
  t0 = time.time()
  state = t.init_state(batch)
  jax.block_until_ready(state.params)
  print(f"init {time.time()-t0:.1f}s", flush=True)

  rng = jax.random.PRNGKey(0)
  for i in range(args.steps):
    t0 = time.time()
    batch = next(data)
    rng, step_rng = jax.random.split(rng)
    state, scalars = t.step_fn(state, batch, step_rng)
    jax.block_until_ready(scalars)
    dt = time.time() - t0
    print(
        f"step {i}: {dt:.1f}s loss {float(scalars['loss']):.4f}",
        flush=True,
    )
  try:
    stats = jax.devices()[0].memory_stats()
    if stats:
      for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if k in stats:
          print(f"{k}: {stats[k] / 2**30:.2f} GiB", flush=True)
  except Exception as e:
    print("memory_stats unavailable:", e, flush=True)


if __name__ == "__main__":
  main()
