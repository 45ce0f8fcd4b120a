"""Speed/accuracy Pareto on a TRAINED checkpoint (round 5).

For each config variant of the fast-inference ladder, measures BOTH:
  * wall time at the north-star workload (1024q x 250f @480p, loop-in-jit)
  * AJ on the held-out synthetic eval set (480p, Kubric-format npz,
    strided queries, the same tapvid.evaluate path a DAVIS run uses)

so every accuracy-trading speed knob (single-resolution refinement, int8
mixer / ExtraConvs / correlation, fewer refinement iterations) carries a
measured AJ cost on trained features rather than random-weight drift
statistics.

Usage:
  python scratch/pareto_r5.py --checkpoint runs/bootstapir_synth/checkpoint.npy \
      --eval_dir runs/synth_eval_480 [--skip_wall] [--only A,B,...]
"""

import argparse
import dataclasses
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu import inference
from tapnet_tpu.checkpoints import tapir_checkpoint
from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.tapvid import datasets as tapvid_datasets
from tapnet_tpu.tapvid import evaluate as tapvid_evaluate
from tapnet_tpu.utils import profiling

FRAMES, QUERIES, RES, CHUNK = 250, 1024, 480, 128


def variants():
  base = dict(compute_dtype="bfloat16")
  single = dict(base)
  v = {
      "A-default-two-res": (base, None),
      "B-single-res": (single, [(RES, RES)]),
      "C-B+int8mixer": (dict(single, quantized_mixer=True), [(RES, RES)]),
      "D-C+int8ec": (
          dict(single, quantized_mixer=True, quantized_extra_convs=True),
          [(RES, RES)],
      ),
      "E-D+int8corr": (
          dict(single, quantized_mixer=True, quantized_extra_convs=True,
               quantized_corr=True),
          [(RES, RES)],
      ),
      "F-E-3iter": (
          dict(single, quantized_mixer=True, quantized_extra_convs=True,
               quantized_corr=True, num_pips_iter=3),
          [(RES, RES)],
      ),
      "G-E-2iter": (
          dict(single, quantized_mixer=True, quantized_extra_convs=True,
               quantized_corr=True, num_pips_iter=2),
          [(RES, RES)],
      ),
      "H-B+int8corr-only": (
          dict(single, quantized_corr=True), [(RES, RES)]
      ),
      # Round-2 ladder: the winners from the first pass, without the
      # per-position int8corr slowdown, plus the zero-overhead per-frame
      # int8corr mode and iteration sweeps of the accuracy config.
      "I-D-2iter": (
          dict(single, quantized_mixer=True, quantized_extra_convs=True,
               num_pips_iter=2),
          [(RES, RES)],
      ),
      "J-D-3iter": (
          dict(single, quantized_mixer=True, quantized_extra_convs=True,
               num_pips_iter=3),
          [(RES, RES)],
      ),
      "K-I+pfcorr": (
          dict(single, quantized_mixer=True, quantized_extra_convs=True,
               quantized_corr="per_frame", num_pips_iter=2),
          [(RES, RES)],
      ),
      "L-D+pfcorr": (
          dict(single, quantized_mixer=True, quantized_extra_convs=True,
               quantized_corr="per_frame"),
          [(RES, RES)],
      ),
      "M-twores-2iter": (dict(base, num_pips_iter=2), None),
      "N-twores-3iter": (dict(base, num_pips_iter=3), None),
      # Round-3 ladder: hoisted per-frame int8 corr (quantize once per
      # pyramid grid) and int8 on the accuracy config.
      "K2-I+pfcorr-hoisted": (
          dict(single, quantized_mixer=True, quantized_extra_convs=True,
               quantized_corr="per_frame", num_pips_iter=2),
          [(RES, RES)],
      ),
      "O-twores2iter+int8": (
          dict(base, num_pips_iter=2, quantized_mixer=True,
               quantized_extra_convs=True),
          None,
      ),
      "P-O+pfcorr": (
          dict(base, num_pips_iter=2, quantized_mixer=True,
               quantized_extra_convs=True, quantized_corr="per_frame"),
          None,
      ),
  }
  return v


def wall_time(params, config, refinement_resolutions):
  model = tapir_lib.TAPIR(config=config)
  rng = np.random.RandomState(0)
  video = jnp.asarray(
      rng.rand(1, FRAMES, RES, RES, 3).astype(np.float32) * 2 - 1
  )
  qp = jnp.asarray(
      np.stack(
          [
              rng.randint(0, FRAMES, QUERIES).astype(np.float32),
              rng.rand(QUERIES) * RES,
              rng.rand(QUERIES) * RES,
          ],
          axis=-1,
      )[None]
  )
  kwargs = {}
  if refinement_resolutions:
    kwargs["refinement_resolutions"] = refinement_resolutions

  def forward(video, qp):
    out = model.apply(
        {"params": params}, video, qp, query_chunk_size=CHUNK, **kwargs
    )
    return out["tracks"], out["occlusion"], out["expected_dist"]

  stats = profiling.benchmark_stats(
      forward, video, qp, iters_per_measure=1, num_measures=4
  )
  return stats


def eval_aj(params, config, refinement_resolutions, eval_dir, max_videos):
  predictor = inference.TapirPredictor(
      params,
      config,
      query_chunk_size=64,
      bfloat16=False,  # compute dtype comes from the config
      refinement_resolutions=refinement_resolutions,
  )
  metrics = tapvid_evaluate.evaluate_dataset(
      predictor,
      tapvid_datasets.create_kubric_dataset(
          eval_dir, query_mode="strided", train_size=(RES, RES)
      ),
      query_mode="strided",
      max_videos=max_videos,
      verbose=False,
  )
  return metrics


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--checkpoint", required=True)
  ap.add_argument("--eval_dir", required=True)
  ap.add_argument("--max_videos", type=int, default=8)
  ap.add_argument("--skip_wall", action="store_true")
  ap.add_argument("--skip_eval", action="store_true")
  ap.add_argument("--only", default=None,
                  help="comma-separated variant-name prefixes")
  args = ap.parse_args()

  params = tapir_checkpoint.load_tapir_checkpoint(args.checkpoint)
  params = jax.tree_util.tree_map(
      lambda x: jnp.asarray(x, jnp.bfloat16), params
  )
  params = jax.device_put(params, jax.devices()[0])

  results = {}
  for name, (overrides, rr) in variants().items():
    if args.only and not any(
        name.startswith(p) for p in args.only.split(",")
    ):
      continue
    config = tapir_lib.bootstapir_config(**overrides)
    row = {}
    if not args.skip_wall:
      t0 = time.time()
      stats = wall_time(params, config, rr)
      row["wall_s_min"] = round(stats["min"], 4)
      row["wall_reps"] = [round(t, 4) for t in stats["reps"]]
      print(f"{name}: wall {stats['min']:.4f} s "
            f"(compile+bench {time.time()-t0:.0f}s)", flush=True)
    if not args.skip_eval:
      m = eval_aj(params, config, rr, args.eval_dir, args.max_videos)
      row["aj"] = round(float(m["average_jaccard"]), 4)
      row["delta_avg"] = round(float(m["average_pts_within_thresh"]), 4)
      row["oa"] = round(float(m["occlusion_accuracy"]), 4)
      print(f"{name}: AJ {row['aj']:.4f} <d>x {row['delta_avg']:.4f} "
            f"OA {row['oa']:.4f}", flush=True)
    results[name] = row
  print(json.dumps(results, indent=2))


if __name__ == "__main__":
  main()
