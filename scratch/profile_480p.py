"""Profile BootsTAPIR 1024q x 250f @480p on the real TPU; dump xprof trace."""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import tapir as tapir_lib

FRAMES = int(os.environ.get("FRAMES", 250))
QUERIES = int(os.environ.get("QUERIES", 1024))
RES = int(os.environ.get("RES", 480))
CHUNK = int(os.environ.get("CHUNK", 128))
TRACE = os.environ.get("TRACE", "")
# REFRES=480 -> refinement at [(480, 480)] only (the speed/quality knob).
REFRES = os.environ.get("REFRES", "")
QUANT = bool(int(os.environ.get("QUANT", "0")))
QEC = bool(int(os.environ.get("QEC", "0")))  # w8a8 ExtraConvs


def main():
  config = tapir_lib.bootstapir_config(
      compute_dtype="bfloat16",
      quantized_mixer=QUANT,
      quantized_extra_convs=QEC,
  )
  model = tapir_lib.TAPIR(config=config)

  rng = np.random.RandomState(0)
  video = jnp.asarray(
      rng.rand(1, FRAMES, RES, RES, 3).astype(np.float32) * 2 - 1
  )
  query_points = jnp.asarray(
      np.stack(
          [
              rng.randint(0, FRAMES, QUERIES).astype(np.float32),
              rng.rand(QUERIES) * RES,
              rng.rand(QUERIES) * RES,
          ],
          axis=-1,
      )[None]
  )

  cpu = jax.local_devices(backend="cpu")[0]
  with jax.default_device(cpu):
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 256, 256, 3), jnp.float32),
        jnp.zeros((1, CHUNK, 3), jnp.float32),
        query_chunk_size=CHUNK,
    )["params"]
  params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
  params = jax.device_put(params, jax.devices()[0])

  @jax.jit
  def forward(video, query_points):
    rr = [(int(REFRES), int(REFRES))] if REFRES else None
    out = model.apply(
        {"params": params}, video, query_points, query_chunk_size=CHUNK,
        refinement_resolutions=rr,
    )
    return out["tracks"], out["occlusion"], out["expected_dist"]

  video = jax.device_put(video, jax.devices()[0])
  query_points = jax.device_put(query_points, jax.devices()[0])

  t0 = time.perf_counter()
  out = forward(video, query_points)
  jax.block_until_ready(out)
  print(f"compile+first run: {time.perf_counter() - t0:.2f}s", flush=True)

  for i in range(3):
    t0 = time.perf_counter()
    out = forward(video, query_points)
    jax.block_until_ready(out)
    print(f"run {i}: {time.perf_counter() - t0:.3f}s", flush=True)

  if TRACE:
    jax.profiler.start_trace(TRACE)
    out = forward(video, query_points)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print(f"trace written to {TRACE}")


if __name__ == "__main__":
  main()
