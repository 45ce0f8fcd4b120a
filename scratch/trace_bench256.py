"""Capture an xprof trace of the bench.py 256^2 workload (3 iterations)."""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import tapir as tapir_lib

TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/trace_bench256")


def main():
  frames, queries, chunk = 32, 256, 64
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
  cpu = jax.local_devices(backend="cpu")[0]
  with jax.default_device(cpu):
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 256, 256, 3), jnp.float32),
        jnp.zeros((1, chunk, 3), jnp.float32),
        query_chunk_size=chunk,
    )["params"]
  params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
  params = jax.device_put(params, jax.devices()[0])

  @jax.jit
  def forward(video, query_points):
    out = model.apply(
        {"params": params}, video, query_points, query_chunk_size=chunk
    )
    return out["tracks"], out["occlusion"], out["expected_dist"]

  video = jax.device_put(video, jax.devices()[0])
  query_points = jax.device_put(query_points, jax.devices()[0])

  out = forward(video, query_points)
  jax.block_until_ready(out)

  for _ in range(2):
    t0 = time.perf_counter()
    out = forward(video, query_points)
    jax.block_until_ready(out)
    print(f"run: {time.perf_counter() - t0:.4f}s", flush=True)

  jax.profiler.start_trace(TRACE_DIR)
  for _ in range(3):
    out = forward(video, query_points)
  jax.block_until_ready(out)
  jax.profiler.stop_trace()
  print("trace written to", TRACE_DIR)


if __name__ == "__main__":
  main()
