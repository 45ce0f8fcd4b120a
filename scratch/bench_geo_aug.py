"""Measure the composed single-warp geometric augmentation on a long clip.

Compares the r5 chained path (roll warp -> homography warp, float32 each
way) against the composed path (one uint8 warp) that
`kubric.geometric_augmentation` now uses — host wall time per example,
i.e. including host<->device transfer through whatever link the device
hangs off (the quantity that gates the tapnextpp input pipeline).

Usage: python scratch/bench_geo_aug.py [--num_frames 256] [--reps 2]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--num_frames", type=int, default=256)
  ap.add_argument("--size", type=int, default=256)
  ap.add_argument("--reps", type=int, default=2)
  args = ap.parse_args()

  import jax.numpy as jnp

  from tapnet_tpu.data import augmentations, kubric

  t, s = args.num_frames, args.size
  rng = np.random.RandomState(0)
  video = (rng.rand(t, s, s, 3) * 255).astype(np.uint8)
  example = {
      "video": video,
      "target_points": rng.rand(64, t, 2).astype(np.float32) * s,
      "occluded": np.zeros((64, t), bool),
  }

  # Composed path (what training uses now).
  transform = kubric.geometric_augmentation(seed=3)
  for r in range(args.reps):
    t0 = time.time()
    out = transform(example)
    print(f"composed rep{r}: {time.time()-t0:.2f}s", flush=True)
  assert out["video"].dtype == np.uint8

  # Chained float path (the pre-composition pipeline), same augs.
  roll = augmentations.RollAugmentation(seed=3)
  homog = augmentations.HomographyAugmentation(seed=4)
  for r in range(args.reps):
    t0 = time.time()
    data = {
        "video": video.astype(np.float32),
        "tracks": np.transpose(example["target_points"], (1, 0, 2)),
    }
    data = homog(roll(data))
    _ = np.clip(np.round(data["video"]), 0, 255).astype(np.uint8)
    print(f"chained  rep{r}: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
  main()
