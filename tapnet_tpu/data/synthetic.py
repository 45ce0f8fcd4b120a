"""Synthetic point-tracking data, generated on device under jit.

Stands in for the reference's external Kubric TFDS pipeline
(training/experiment.py:263, kubric.challenges.point_tracking.dataset) in
environments without the dataset: textured sprites translate over a textured
background; query points ride the sprites, with occlusion when a point leaves
the frame or is covered by a later-drawn sprite.

Because generation is pure jnp from a PRNGKey, batches are created directly
on the accelerator — there is no host input pipeline to feed or prefetch.
"""

from __future__ import annotations

import functools
from typing import Iterator, Mapping, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@functools.partial(
    jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7)
)
def make_batch(
    rng: Array,
    batch_size: int = 1,
    num_frames: int = 8,
    height: int = 256,
    width: int = 256,
    num_queries: int = 32,
    num_sprites: int = 6,
    vel_range: float = 3.0,
) -> Mapping[str, Array]:
  """Generates one batch {video, query_points, target_points, occluded}.

  `num_sprites` / `vel_range` (max px/frame sprite speed) shift the data
  distribution — e.g. a crowded fast domain for domain-adaptation
  experiments (the BootsTAP self-training demonstration).
  """

  def one_example(rng):
    keys = jax.random.split(rng, 8)
    # Background: low-frequency noise upsampled.
    bg_small = jax.random.uniform(keys[0], (8, 8, 3))
    bg = jax.image.resize(bg_small, (height, width, 3), "bilinear")

    # Sprites: position (center, at t=0), velocity, half-size, texture.
    pos0 = jax.random.uniform(
        keys[1], (num_sprites, 2),
        minval=jnp.array([height * 0.2, width * 0.2]),
        maxval=jnp.array([height * 0.8, width * 0.8]),
    )
    vel = jax.random.uniform(
        keys[2], (num_sprites, 2), minval=-vel_range, maxval=vel_range
    )
    half = jax.random.uniform(
        keys[3], (num_sprites, 1),
        minval=height * 0.06, maxval=height * 0.18,
    )
    tex_small = jax.random.uniform(keys[4], (num_sprites, 8, 8, 3))
    tex_res = tex_small.shape[1]

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")

    def render_frame(t):
      frame = bg

      def paint(frame_and_depth, s):
        frame, depth = frame_and_depth
        center = pos0[s] + vel[s] * t
        inside = (
            (jnp.abs(grid_y - center[0]) < half[s, 0])
            & (jnp.abs(grid_x - center[1]) < half[s, 0])
        )
        # Texture sampled in SPRITE-LOCAL coordinates, so the pattern
        # translates rigidly with the sprite — point appearance follows
        # the ground-truth tracks (a point's local texture is what a
        # tracker must learn to match). Bilinear sampling of the tiny
        # texture is done as a dense tent-weight contraction (no gathers;
        # TPU pads gather operands catastrophically — same trick as
        # ops/corr_tents.py).
        u = (grid_y - center[0]) / (2 * half[s, 0]) + 0.5
        v = (grid_x - center[1]) / (2 * half[s, 0]) + 0.5
        taps = jnp.arange(tex_res, dtype=jnp.float32)
        wu = jnp.maximum(
            0.0,
            1.0 - jnp.abs(
                jnp.clip(u, 0.0, 1.0)[..., None] * (tex_res - 1) - taps
            ),
        )  # [H, W, tex_res] tent weights over texture rows
        wv = jnp.maximum(
            0.0,
            1.0 - jnp.abs(
                jnp.clip(v, 0.0, 1.0)[..., None] * (tex_res - 1) - taps
            ),
        )
        tex = jnp.einsum("hwi,hwj,ijc->hwc", wu, wv, tex_small[s])
        frame = jnp.where(inside[..., None], tex, frame)
        depth = jnp.where(inside, s, depth)
        return (frame, depth), None

      (frame, depth), _ = jax.lax.scan(
          paint, (frame, jnp.full((height, width), -1)),
          jnp.arange(num_sprites),
      )
      return frame, depth

    frames, depths = jax.vmap(render_frame)(
        jnp.arange(num_frames, dtype=jnp.float32)
    )

    # Queries: pick a sprite, a point inside it, and a random query frame.
    sprite_id = jax.random.randint(
        keys[5], (num_queries,), 0, num_sprites
    )
    offset = jax.random.uniform(
        keys[6], (num_queries, 2), minval=-0.9, maxval=0.9
    ) * half[sprite_id]
    t_query = jax.random.randint(keys[7], (num_queries,), 0, num_frames)

    ts = jnp.arange(num_frames, dtype=jnp.float32)
    # [Q, T, 2] (y, x) positions over time.
    centers = pos0[sprite_id][:, None, :] + (
        vel[sprite_id][:, None, :] * ts[None, :, None]
    )
    track_yx = centers + offset[:, None, :]

    in_frame = (
        (track_yx[..., 0] > 0)
        & (track_yx[..., 0] < height)
        & (track_yx[..., 1] > 0)
        & (track_yx[..., 1] < width)
    )
    # Occluded if covered by a later-drawn sprite (higher depth index).
    iy = jnp.clip(track_yx[..., 0].astype(jnp.int32), 0, height - 1)
    ix = jnp.clip(track_yx[..., 1].astype(jnp.int32), 0, width - 1)
    depth_at = depths[
        jnp.arange(num_frames)[None, :], iy, ix
    ]  # [Q, T]
    occluded = (~in_frame) | (depth_at > sprite_id[:, None])

    query_yx = jnp.take_along_axis(
        track_yx, t_query[:, None, None], axis=1
    )[:, 0]
    query_points = jnp.concatenate(
        [t_query[:, None].astype(jnp.float32), query_yx], axis=-1
    )
    target_points = track_yx[..., ::-1]  # (x, y)
    video = frames * 2.0 - 1.0
    return video, query_points, target_points, occluded

  rngs = jax.random.split(rng, batch_size)
  video, qp, tp, occ = jax.vmap(one_example)(rngs)
  return {
      "video": video,
      "query_points": qp,
      "target_points": tp,
      "occluded": occ.astype(jnp.float32),
  }


def batch_iterator(
    seed: int = 0, **kwargs
) -> Iterator[Mapping[str, Array]]:
  """Infinite generator of device-resident batches."""
  rng = jax.random.PRNGKey(seed)
  while True:
    rng, key = jax.random.split(rng)
    yield make_batch(key, **kwargs)


def export_npz(
    out_dir: str,
    num_examples: int,
    seed: int = 10_000,
    num_frames: int = 24,
    height: int = 256,
    width: int = 256,
    num_queries: int = 64,
    num_sprites: int = 6,
    vel_range: float = 3.0,
) -> None:
  """Writes a fixed synthetic dataset in the Kubric npz layout.

  Produces the held-out eval sets consumed by
  `tapvid.datasets.create_kubric_dataset` / `tapvid.evaluate` (the
  reference's eval_kubric mode evaluates on Kubric-format batches,
  supervised_point_prediction.py:686-693). Use a `seed` disjoint from the
  training iterator's so eval videos are never trained on.
  """
  import os

  import numpy as np

  os.makedirs(out_dir, exist_ok=True)
  rng = jax.random.PRNGKey(seed)
  for i in range(num_examples):
    rng, key = jax.random.split(rng)
    batch = make_batch(
        key, 1, num_frames, height, width, num_queries, num_sprites,
        vel_range,
    )
    video = np.asarray(batch["video"][0])
    np.savez(
        os.path.join(out_dir, f"synth_{i:04d}.npz"),
        video=np.clip((video + 1.0) * 127.5, 0, 255).astype(np.uint8),
        target_points=np.asarray(batch["target_points"][0]),
        occluded=np.asarray(batch["occluded"][0]).astype(bool),
    )
