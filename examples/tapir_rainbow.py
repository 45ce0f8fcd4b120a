"""Rainbow visualization demo: dense tracks with motion-compensated tails.

Mirrors the reference's `colabs/tapir_rainbow_demo.ipynb`: track a grid of
points on a (foreground) frame, estimate per-frame camera homographies from
the tracks themselves, and render each point's full history as a tail that
stays glued to the scene while the camera moves.

Usage:
  python examples/tapir_rainbow.py                      # synthetic smoke run
  python examples/tapir_rainbow.py --video clip.mp4 \
      --checkpoint tapir_checkpoint_panning.npy
"""

import argparse
import os
import sys

# Allow running directly from a source checkout without pip-installing.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

try:
  from examples import _common
except ImportError:  # run as a script from inside examples/
  import _common
from tapnet_tpu import inference
from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.utils import viz


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--video", default=None)
  p.add_argument("--checkpoint", default=None)
  p.add_argument("--resize", type=int, nargs=2, default=[256, 256])
  p.add_argument("--grid_stride", type=int, default=32)
  p.add_argument("--query_frame", type=int, default=0)
  p.add_argument("--num_frames", type=int, default=24,
               help="synthetic clip length when no --video")
  p.add_argument("--tiny", action="store_true",
               help="2-block model for quick smoke runs (random weights)")
  p.add_argument("--out", default="/tmp/tapir_rainbow.mp4")
  args = p.parse_args()

  video_u8 = _common.load_video(
      args.video, num_frames=args.num_frames, resize=tuple(args.resize)
  )
  t, h, w = video_u8.shape[:3]
  config = tapir_lib.tapir_config()
  if args.tiny:
    config = _common.tiny_tapir(config)
  params = _common.tapir_params(args.checkpoint, config, (t, h, w))

  predictor = inference.TapirPredictor(params, config=config)
  queries = _common.grid_queries(args.query_frame, h, w, args.grid_stride)
  out = predictor(_common.normalize_video(video_u8), queries)
  tracks = out["tracks"][0]  # [N, T, 2] (x, y)
  occluded = 1.0 - predictor.visibles(out)[0].astype(np.float32)

  print("estimating per-frame camera homographies from the tracks...")
  try:
    homogs, _, _ = viz.get_homographies_wrt_frame(
        tracks, occluded, (w, h), reference_frame=args.query_frame
    )
  except np.linalg.LinAlgError:
    # Degenerate tracks (e.g. random weights) — fall back to a static camera.
    print("homography estimation failed; assuming a static camera")
    homogs = np.broadcast_to(np.eye(3), (t, 3, 3)).copy()
  frames = viz.plot_tracks_tails(video_u8, tracks, occluded, homogs)
  viz.write_video(args.out, frames, fps=10)
  print(f"wrote {args.out}")


if __name__ == "__main__":
  main()
