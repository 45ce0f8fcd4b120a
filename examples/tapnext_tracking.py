"""TAPNext tracking demo (offline and streaming).

Mirrors the reference's `colabs/tapnext_demo.ipynb` /
`torch_tapnext_demo.ipynb`: track points with the ViT-SSM model, either in
one offline pass or frame-by-frame with recurrent state.

Usage:
  python examples/tapnext_tracking.py                   # tiny smoke run
  python examples/tapnext_tracking.py --video clip.mp4 \
      --checkpoint bootstapnext_ckpt.npz --variant B --streaming
"""

import argparse
import os
import sys

# Allow running directly from a source checkout without pip-installing.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import numpy as np

try:
  from examples import _common
except ImportError:  # run as a script from inside examples/
  import _common
from tapnet_tpu import inference
from tapnet_tpu.models import ssm_vit, tapnext


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--video", default=None)
  p.add_argument("--checkpoint", default=None)
  p.add_argument("--variant", default=None,
                 help="B for released checkpoints; default: tiny 'mu'")
  p.add_argument("--grid_stride", type=int, default=64)
  p.add_argument("--streaming", action="store_true")
  p.add_argument("--num_frames", type=int, default=24,
               help="synthetic clip length when no --video")
  p.add_argument("--out", default="/tmp/tapnext_tracks.mp4")
  args = p.parse_args()

  # TAPNext runs at its trained resolution (default 256x256).
  variant = args.variant or ("B" if args.checkpoint else "mu")
  config = ssm_vit.variant_config(variant)
  video_u8 = _common.load_video(
      args.video, num_frames=args.num_frames, resize=config.image_size
  )
  t, h, w = video_u8.shape[:3]
  video = _common.normalize_video(video_u8)
  queries = _common.grid_queries(0, h, w, args.grid_stride)

  if args.checkpoint and os.path.exists(args.checkpoint):
    from tapnet_tpu.checkpoints import tapnext_checkpoint

    params = tapnext_checkpoint.load_tapnext_checkpoint(args.checkpoint)
  else:
    print("no checkpoint — RANDOM weights (pipeline demo only)")
    model = tapnext.TAPNextTracker(config=config)
    params = model.init(
        jax.random.PRNGKey(0), video[:, :2], queries
    )["params"]

  if args.streaming:
    predictor = inference.OnlineTapnextPredictor(params, config=config)
    tracks0, vis0 = predictor.init(video[:, :1], queries)
    all_tracks = [tracks0[0, :, 0]]  # [Q, 2] (y, x)
    all_visible = [vis0[0, :, 0, 0] > 0]
    for i in range(1, t):
      tr, vis = predictor.predict(video[:, i])
      all_tracks.append(tr[0])
      all_visible.append(vis[0])
    tracks = np.stack(all_tracks, axis=1)[..., ::-1]  # [Q, T, 2] (x, y)
    visibles = np.stack(all_visible, axis=1)
  else:
    predictor = inference.TapnextPredictor(params, config=config)
    out = predictor(video, queries)
    tracks = out["tracks"][0]
    visibles = out["occlusion"][0] < 0.0

  print(
      f"tracked {queries.shape[1]} points over {t} frames "
      f"({'streaming' if args.streaming else 'offline'}); "
      f"mean visibility {np.mean(visibles):.2f}"
  )
  _common.save_tracks_video(args.out, video_u8, tracks, visibles)


if __name__ == "__main__":
  main()
