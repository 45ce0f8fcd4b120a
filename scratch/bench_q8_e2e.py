"""End-to-end 480p north-star config: bf16 vs quantized_mixer=True.

Measures wall time and the track drift the int8 mixer introduces
(positions in pixels at 480p, occlusion logits), with the fused
InstanceNorm kernel active in both runs.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import tapir as tapir_lib

FRAMES, QUERIES, RES, CHUNK = 250, 1024, 480, 128


def run(quantized):
  config = tapir_lib.bootstapir_config(
      compute_dtype="bfloat16", quantized_mixer=quantized
  )
  model = tapir_lib.TAPIR(config=config)
  rng = np.random.RandomState(0)
  video = jnp.asarray(
      rng.rand(1, FRAMES, RES, RES, 3).astype(np.float32) * 2 - 1
  )
  qp = jnp.asarray(
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
  def forward(video, qp):
    out = model.apply({"params": params}, video, qp, query_chunk_size=CHUNK)
    return out["tracks"], out["occlusion"]

  video = jax.device_put(video, jax.devices()[0])
  qp = jax.device_put(qp, jax.devices()[0])
  t0 = time.perf_counter()
  out = forward(video, qp)
  jax.block_until_ready(out)
  print(f"q={quantized} compile+run {time.perf_counter()-t0:.1f}s",
        flush=True)
  times = []
  for _ in range(3):
    t0 = time.perf_counter()
    out = forward(video, qp)
    jax.block_until_ready(out)
    times.append(time.perf_counter() - t0)
  print(f"q={quantized} reps {[round(t, 3) for t in times]}", flush=True)
  return np.asarray(out[0], np.float32), np.asarray(out[1], np.float32)


def main():
  tr_f, occ_f = run(False)
  tr_q, occ_q = run(True)
  dpos = np.linalg.norm(tr_q - tr_f, axis=-1)
  print(
      f"track drift px @480p: mean {dpos.mean():.3f} p50 "
      f"{np.percentile(dpos, 50):.3f} p95 {np.percentile(dpos, 95):.3f} "
      f"max {dpos.max():.2f}",
      flush=True,
  )
  print(
      f"occlusion-logit drift: mean {np.abs(occ_q - occ_f).mean():.4f} "
      f"max {np.abs(occ_q - occ_f).max():.3f}",
      flush=True,
  )


if __name__ == "__main__":
  main()
