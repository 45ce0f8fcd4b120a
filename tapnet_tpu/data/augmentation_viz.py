"""Visualizes the roll / homography video augmentations as GIFs.

Capability parity: tapnet/tapnextpp/augmentations/{roll,homography}
_visualization.py. Improvement over the reference scripts: the synthetic
clip carries a ground-truth track on the moving dot, and the augmented
track is drawn back onto the warped frames — so the GIF doubles as a
visual check that point coordinates are transformed consistently with
pixels (the marker must stay glued to the dot).

  python -m tapnet_tpu.data.augmentation_viz --mode roll \
      --output_path /tmp/roll_viz.gif
"""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

import numpy as np

from tapnet_tpu.data import augmentations


def make_dot_video(
    num_frames: int = 128, height: int = 256, width: int = 256
) -> Tuple[np.ndarray, np.ndarray]:
  """A white clip with a red dot orbiting the center; returns
  (video [T, H, W, 3] uint8, tracks [T, 1, 2] (x, y)).

  The dot is pure red so it stays distinguishable from the black
  constant-fill that the warps introduce at the frame borders."""
  yy, xx = np.mgrid[0:height, 0:width]
  frames, tracks = [], []
  for i in range(num_frames):
    angle = 16 * np.pi * i / num_frames
    cx = width / 2 + 50 * np.cos(angle)
    cy = height / 2 + 50 * np.sin(angle)
    frame = np.full((height, width, 3), 255, np.uint8)
    dot = (yy - cy) ** 2 + (xx - cx) ** 2 <= 20**2
    frame[dot] = (255, 0, 0)
    # Corner labels (blue TL block / black BR block) to make flips obvious.
    frame[8:20, 8:20] = (0, 0, 255)
    frame[-20:-8, -20:-8] = 0
    frames.append(frame)
    tracks.append([[cx, cy]])
  return np.stack(frames), np.asarray(tracks, np.float32)


def draw_marker(
    frame: np.ndarray, xy: np.ndarray, radius: int = 4
) -> np.ndarray:
  """Draws a green ring at (x, y); out-of-frame points are skipped."""
  h, w = frame.shape[:2]
  x, y = float(xy[0]), float(xy[1])
  if not (0 <= x < w and 0 <= y < h):
    return frame
  yy, xx = np.mgrid[0:h, 0:w]
  d2 = (yy - y) ** 2 + (xx - x) ** 2
  ring = (d2 <= (radius + 1.5) ** 2) & (d2 >= (radius - 1.5) ** 2)
  frame = frame.copy()
  frame[ring] = (0, 200, 0)
  return frame


def visualize(
    mode: str,
    output_path: str,
    num_frames: int = 128,
    seed: Optional[int] = 0,
    fps: int = 30,
) -> str:
  """Renders the augmented clip (with the warped track overlaid) to a GIF."""
  video, tracks = make_dot_video(num_frames)
  if mode == "roll":
    aug = augmentations.RollAugmentation(p=1.1, strength=1.0, seed=seed)
  elif mode == "homography":
    aug = augmentations.HomographyAugmentation(
        p=1.1, strength=1.0, seed=seed
    )
  else:
    raise ValueError(f"mode must be roll|homography, got {mode!r}")

  out = aug({"video": video.astype(np.float32), "tracks": tracks})
  warped = np.clip(out["video"], 0, 255).astype(np.uint8)
  frames = [
      draw_marker(warped[i], out["tracks"][i, 0])
      for i in range(len(warped))
  ]

  import imageio

  imageio.mimsave(output_path, frames, fps=fps, loop=0)
  print(f"Saved {mode} augmentation GIF to {output_path}")
  return output_path


def main(argv=None) -> None:
  # Host-side visualization tool: never worth a device round-trip per frame.
  import jax

  jax.config.update("jax_platforms", "cpu")
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("--mode", choices=["roll", "homography"],
                      default="roll")
  parser.add_argument("--output_path", default="/tmp/aug_viz.gif")
  parser.add_argument("--num_frames", type=int, default=128)
  parser.add_argument("--seed", type=int, default=0)
  args = parser.parse_args(argv)
  visualize(args.mode, args.output_path, args.num_frames, args.seed)


if __name__ == "__main__":
  main()
