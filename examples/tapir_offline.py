"""Offline TAPIR/BootsTAPIR tracking demo.

Mirrors the reference's `colabs/tapir_demo.ipynb` / `torch_tapir_demo.ipynb`:
load a video, place a grid of query points on the first frame, run the
offline model once over the whole clip, and write a visualization.

Usage:
  python examples/tapir_offline.py                      # synthetic smoke run
  python examples/tapir_offline.py --video clip.mp4 \
      --checkpoint bootstapir_checkpoint_v2.npy --model bootstapir \
      --bfloat16 --out tracks.mp4
"""

import argparse
import os
import sys

# Allow running directly from a source checkout without pip-installing.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

try:
  from examples import _common
except ImportError:  # run as a script from inside examples/
  import _common
from tapnet_tpu import inference
from tapnet_tpu.models import tapir as tapir_lib

CONFIGS = {
    "tapir": tapir_lib.tapir_config,
    "bootstapir": tapir_lib.bootstapir_config,
}


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--video", default=None)
  p.add_argument("--checkpoint", default=None)
  p.add_argument("--model", default="tapir", choices=sorted(CONFIGS))
  p.add_argument("--resize", type=int, nargs=2, default=[256, 256])
  p.add_argument("--grid_stride", type=int, default=32)
  p.add_argument("--bfloat16", action="store_true")
  p.add_argument("--num_frames", type=int, default=24,
               help="synthetic clip length when no --video")
  p.add_argument("--tiny", action="store_true",
               help="2-block model for quick smoke runs (random weights)")
  p.add_argument("--out", default="/tmp/tapir_tracks.mp4")
  args = p.parse_args()

  video_u8 = _common.load_video(
      args.video, num_frames=args.num_frames, resize=tuple(args.resize)
  )
  t, h, w = video_u8.shape[:3]
  config = CONFIGS[args.model]()
  if args.tiny:
    config = _common.tiny_tapir(config)
  params = _common.tapir_params(args.checkpoint, config, (t, h, w))

  predictor = inference.TapirPredictor(
      params, config=config, bfloat16=args.bfloat16
  )
  queries = _common.grid_queries(0, h, w, args.grid_stride)
  out = predictor(_common.normalize_video(video_u8), queries)
  visibles = predictor.visibles(out)

  print(
      f"tracked {queries.shape[1]} points over {t} frames; "
      f"mean visibility {visibles.mean():.2f}"
  )
  _common.save_tracks_video(
      args.out, video_u8, out["tracks"][0], visibles[0]
  )


if __name__ == "__main__":
  main()
