"""Benchmark: TAPIR offline tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measures points*frames/sec for the full (12-block, ResNet-18) TAPIR at
256x256. The only published throughput anchor in the reference is the live
demo: ~17 fps at 480x480 with 8 points on a Quadro RTX 4000 (README.md:115),
i.e. 136 points*frames/sec; vs_baseline is the ratio against that anchor.
"""

import json
import os


import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TAPNET_TPU_CACHE", "/tmp/tapnet_tpu_jax_cache"),
)

import jax.numpy as jnp
import numpy as np

# Reference anchor: 17 fps x 8 points (README.md:115).
BASELINE_POINTS_FRAMES_PER_SEC = 17.0 * 8.0


def main():
  from tapnet_tpu.models import tapir as tapir_lib

  frames, queries = 32, 256
  chunk = 64

  # bf16 compute (fp32 accumulations/heads): the production TPU path,
  # ~3.7x over fp32; positions agree with fp32 to well under a pixel.
  config = tapir_lib.tapir_config(compute_dtype="bfloat16")
  model = tapir_lib.TAPIR(config=config)

  rng = np.random.RandomState(0)
  video = jnp.asarray(
      rng.rand(1, frames, 256, 256, 3).astype(np.float32) * 2 - 1
  )
  query_points = jnp.asarray(
      np.stack(
          [
              rng.randint(0, frames, queries).astype(np.float32),
              rng.rand(queries) * 256,
              rng.rand(queries) * 256,
          ],
          axis=-1,
      )[None]
  )

  # Initialize params on the host CPU backend (fast) and transfer; running
  # flax init through the remote-TPU tunnel costs minutes.
  cpu = jax.local_devices(backend="cpu")[0]
  with jax.default_device(cpu):
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 256, 256, 3), jnp.float32),
        jnp.zeros((1, chunk, 3), jnp.float32),
        query_chunk_size=chunk,
    )["params"]
  params = jax.tree_util.tree_map(
      lambda x: x.astype(jnp.bfloat16), params
  )
  params = jax.device_put(params, jax.devices()[0])

  def forward(video, query_points):
    out = model.apply(
        {"params": params}, video, query_points, query_chunk_size=chunk
    )
    return out["tracks"], out["occlusion"], out["expected_dist"]

  # Amortized timing: iterate inside one jit so the remote-dispatch sync
  # round-trip (~30 ms on tunneled backends) doesn't pollute the number.
  from tapnet_tpu.utils import profiling

  best = profiling.benchmark(
      forward, video, query_points, iters_per_measure=3, num_measures=3
  )
  pf_per_sec = queries * frames / best
  print(
      json.dumps({
          "metric": "tapir_offline_points_frames_per_sec_256px",
          "value": round(pf_per_sec, 1),
          "unit": "points*frames/s/chip",
          "vs_baseline": round(pf_per_sec / BASELINE_POINTS_FRAMES_PER_SEC, 2),
          "config": {
              "frames": frames,
              "queries": queries,
              "resolution": 256,
              "chunk": chunk,
              "compute_dtype": "bfloat16",
              "wall_s": round(best, 4),
              "device": str(jax.devices()[0]),
          },
      })
  )


if __name__ == "__main__":
  main()
