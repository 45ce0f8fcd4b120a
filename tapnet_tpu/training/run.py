"""Training CLI: the `python -m tapnet.training.experiment` equivalent.

  python -m tapnet_tpu.training.run --experiment tapir \
      [--data_dir kubric_npz/] [--synthetic] [--num_steps 1000] \
      [--checkpoint_dir /tmp/ckpt] [--model_parallel 1]
"""

from __future__ import annotations

import argparse
import os


def main():
  parser = argparse.ArgumentParser(description="tapnet_tpu training")
  parser.add_argument(
      "--experiment", default="tapir",
      help="registry name: tapir / tapnet / causal_tapir / bootstapir / "
      "tapnext / tapnextpp",
  )
  parser.add_argument("--data_dir", default=None,
                      help="directory of Kubric-format npz examples")
  parser.add_argument("--synthetic", action="store_true",
                      help="train on the synthetic sprite generator")
  parser.add_argument("--num_steps", type=int, default=None,
                      help="steps to run in THIS invocation")
  parser.add_argument(
      "--total_steps", type=int, default=None,
      help="schedule horizon (cosine decay length); defaults to "
      "--num_steps. Keep it fixed across resumed invocations so the LR "
      "schedule stays consistent (it is indexed by the absolute step).",
  )
  parser.add_argument("--checkpoint_dir", default=None)
  parser.add_argument("--checkpoint_every", type=int, default=1000)
  parser.add_argument("--log_every", type=int, default=50)
  parser.add_argument("--batch_size", type=int, default=None)
  parser.add_argument("--model_parallel", type=int, default=1)
  parser.add_argument(
      "--eval_dir", default=None,
      help="directory of Kubric-format npz examples for in-train held-out "
      "eval (the reference's eval_kubric mode); AJ/OA go to the JSONL "
      "telemetry sink next to the checkpoint",
  )
  parser.add_argument("--eval_every", type=int, default=None,
                      help="steps between in-train evals "
                      "(default: the preset's evaluate_every)")
  parser.add_argument("--eval_max_videos", type=int, default=None)
  parser.add_argument("--num_frames", type=int, default=None)
  parser.add_argument("--num_queries", type=int, default=None)
  parser.add_argument("--seed", type=int, default=0)
  parser.add_argument(
      "--smoke", action="store_true",
      help="shrink model and data for a quick correctness run",
  )
  args = parser.parse_args()

  from tapnet_tpu import configs
  from tapnet_tpu.parallel import mesh as mesh_lib
  from tapnet_tpu.training import trainer as trainer_lib

  exp = configs.get_experiment(args.experiment)
  if args.smoke:
    import dataclasses

    from tapnet_tpu.models import tapir as tapir_lib

    if exp.model_kind != "tapir":
      raise ValueError("--smoke currently supports tapir-family experiments")
    exp = dataclasses.replace(
        exp,
        model_config=dataclasses.replace(
            exp.model_config,
            num_mixer_blocks=2,
            num_pips_iter=2,
            initial_resolution=(32, 32),
            blocks_per_group=(1, 1, 1, 1),
        ),
        data=dataclasses.replace(
            exp.data,
            train_size=(32, 32),
            num_frames=3,
            num_queries=8,
            batch_size=2,
        ),
        task=trainer_lib.TaskConfig(train_chunk_size=4),
        optimizer=dataclasses.replace(exp.optimizer, warmup_steps=2),
    )
  batch_size = args.batch_size or exp.data.batch_size
  num_steps = args.num_steps or exp.total_steps
  num_frames = args.num_frames or exp.data.num_frames
  num_queries = args.num_queries or exp.data.num_queries

  if args.synthetic or args.data_dir is None:
    from tapnet_tpu.data import synthetic

    data = synthetic.batch_iterator(
        seed=args.seed,
        batch_size=batch_size,
        num_frames=num_frames,
        height=exp.data.train_size[0],
        width=exp.data.train_size[1],
        num_queries=num_queries,
    )
    if args.data_dir is None and not args.synthetic:
      print("no --data_dir given; training on synthetic data")
  else:
    from tapnet_tpu.data import kubric

    data = kubric.training_iterator(
        args.data_dir,
        batch_size,
        train_size=exp.data.train_size,
        num_queries=num_queries,
        color_augment=exp.data.color_augment,
        geometric_augment=exp.data.geometric_augment,
        seed=args.seed,
    )

  ckpt_path = (
      os.path.join(args.checkpoint_dir, "checkpoint.npy")
      if args.checkpoint_dir
      else None
  )
  t = trainer_lib.Trainer(
      exp.build_model(),
      exp.optimizer,
      total_steps=args.total_steps or num_steps,
      task=exp.task,
      mesh=mesh_lib.make_mesh(model_parallel=args.model_parallel),
      checkpoint_path=ckpt_path,
      checkpoint_every=args.checkpoint_every,
      loss_builder=exp.loss_builder,
      # Long-clip presets (time-chunked BPTT): init on a short slice
      # (params are clip-length-independent).
      init_num_frames=8 if exp.train_time_chunk else None,
  )
  eval_fn = None
  eval_every = args.eval_every or exp.evaluate_every
  if args.eval_dir:
    from tapnet_tpu.tapvid import datasets as tapvid_datasets
    from tapnet_tpu.tapvid import evaluate as tapvid_evaluate

    eval_fn = tapvid_evaluate.make_eval_fn(
        t.model,
        lambda: tapvid_datasets.create_kubric_dataset(
            args.eval_dir,
            query_mode="strided",
            train_size=exp.data.train_size,
        ),
        query_mode="strided",
        query_chunk_size=exp.task.train_chunk_size,
        max_videos=args.eval_max_videos,
    )

  state = t.restore_or_init(next(iter([next(data)])))
  state = t.fit(
      state,
      data,
      num_steps=num_steps,
      log_every=args.log_every,
      eval_fn=eval_fn,
      evaluate_every=eval_every if eval_fn else 0,
  )
  if ckpt_path:
    from tapnet_tpu.training import checkpointing

    checkpointing.save_checkpoint(
        ckpt_path,
        dict(
            params=state.params,
            opt_state=state.opt_state,
            step=int(state.step),
        ),
    )
  print(f"finished at step {int(state.step)}")


if __name__ == "__main__":
  main()
