"""Measures iteration-major vs chunk-major refinement at the 480p config.

Usage: python scratch/bench_iter_major.py [--quick]
"""

import sys
import time

import jax

jax.config.update(
    "jax_default_prng_impl", "rbg"
)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.utils import profiling


def run(iteration_major: bool, frames=250, queries=1024, res=480, chunk=128):
  config = tapir_lib.bootstapir_config(
      compute_dtype="bfloat16", iteration_major_refinement=iteration_major
  )
  model = tapir_lib.TAPIR(config=config)
  rng = np.random.RandomState(0)
  video = jnp.asarray(
      rng.rand(1, frames, res, res, 3).astype(np.float32) * 2 - 1
  )
  qp = jnp.asarray(
      np.stack(
          [
              rng.randint(0, frames, queries).astype(np.float32),
              rng.rand(queries) * res,
              rng.rand(queries) * res,
          ],
          -1,
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

  def forward(video, qp):
    out = model.apply(
        {"params": params}, video, qp, query_chunk_size=chunk
    )
    return out["tracks"], out["occlusion"], out["expected_dist"]

  stats = profiling.benchmark_stats(
      forward, video, qp, iters_per_measure=1, num_measures=3
  )
  print(
      f"iteration_major={iteration_major}: min {stats['min']:.4f}s "
      f"median {stats['median']:.4f}s reps {stats['reps']}",
      flush=True,
  )
  return forward, video, qp, stats


def main():
  quick = "--quick" in sys.argv
  kw = dict(frames=50, queries=256, res=480, chunk=128) if quick else {}
  f0, v, q, s0 = run(False, **kw)
  r0 = jax.device_get(f0(v, q))
  f1, _, _, s1 = run(True, **kw)
  r1 = jax.device_get(f1(v, q))
  for name, a, b in zip(("tracks", "occ", "expd"), r0, r1):
    d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
    print(f"{name}: max|diff| {d.max():.4e}", flush=True)
  print(f"speedup: {s0['min'] / s1['min']:.3f}x", flush=True)


if __name__ == "__main__":
  main()
