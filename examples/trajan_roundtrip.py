"""TRAJAN demo: compress point tracks to latent tokens and reconstruct.

Mirrors the reference's `colabs/trajan_demo.ipynb`: encode a set of
(track, visibility) trajectories into quantized latent tokens, then decode
arbitrary query points back into full trajectories — the autoencoder's
reconstruction error doubles as a motion-realism metric.

Usage:
  python examples/trajan_roundtrip.py                   # tiny smoke run
  python examples/trajan_roundtrip.py --checkpoint trajan.npz --num_tracks 64
"""

import argparse
import os
import sys

# Allow running directly from a source checkout without pip-installing.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.trajan import track_autoencoder


def synthetic_tracks(num_tracks, num_frames, seed=0):
  """Smooth sinusoidal trajectories in normalized [0, 1] coordinates."""
  rng = np.random.RandomState(seed)
  t = np.linspace(0, 1, num_frames)[None]
  base = rng.rand(num_tracks, 2)
  amp = rng.rand(num_tracks, 2) * 0.2
  phase = rng.rand(num_tracks, 2) * 2 * np.pi
  freq = rng.randint(1, 4, (num_tracks, 2))
  tracks = np.stack(
      [
          base[:, i, None] + amp[:, i, None]
          * np.sin(2 * np.pi * freq[:, i, None] * t + phase[:, i, None])
          for i in range(2)
      ],
      axis=-1,
  ).astype(np.float32)
  visible = (rng.rand(num_tracks, num_frames, 1) > 0.1).astype(np.float32)
  return np.clip(tracks, 0, 1), visible


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--checkpoint", default=None)
  p.add_argument("--num_tracks", type=int, default=8)
  p.add_argument("--num_frames", type=int, default=150)
  args = p.parse_args()

  tracks, visible = synthetic_tracks(args.num_tracks, args.num_frames)
  inputs = {
      "support_tracks": jnp.asarray(tracks)[None],
      "support_tracks_visible": jnp.asarray(visible)[None],
      "boundary_frame": jnp.full((1,), args.num_frames, jnp.int32),
      # Decode queries: each track's first visible position.
      "query_points": jnp.concatenate(
          [
              jnp.zeros((1, args.num_tracks, 1)),
              jnp.asarray(tracks[None, :, 0, ::-1]),
          ],
          axis=-1,
      ).astype(jnp.float32),
  }

  if args.checkpoint and os.path.exists(args.checkpoint):
    model = track_autoencoder.TrackAutoEncoder(
        num_output_frames=args.num_frames
    )
    params = np.load(args.checkpoint, allow_pickle=True).item()
  else:
    print("no checkpoint — RANDOM weights (pipeline demo only)")
    model = track_autoencoder.TrackAutoEncoder(
        num_output_frames=args.num_frames,
        num_latent_tokens=8,
        latent_token_dim=16,
        encoder_latent_dim=64,
        track_token_dim=32,
        decoder_num_channels=256,
        time_feat_dim=128,
    )
    params = model.init(jax.random.PRNGKey(0), inputs)["params"]

  out = jax.jit(lambda v, x: model.apply({"params": v}, x))(params, inputs)

  err = np.abs(np.asarray(out.tracks[0]) - tracks).mean()
  print(
      f"encoded {args.num_tracks} tracks x {args.num_frames} frames -> "
      f"latents; decoded tracks {out.tracks.shape}, "
      f"mean reconstruction error {err:.4f} (normalized coords)"
  )


if __name__ == "__main__":
  main()
