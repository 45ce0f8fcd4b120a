"""End-to-end effect of w8a8 ExtraConvs at the 480p north-star workload.

Modes: fast (single-res + int8 mixer) with and without quantized_extra_convs,
and the default multi-res config with it.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.utils import profiling

FRAMES, QUERIES, RES, CHUNK = 250, 1024, 480, 128


def run(name, qec, single_res, qmix=True):
  config = tapir_lib.bootstapir_config(
      compute_dtype="bfloat16",
      quantized_mixer=qmix,
      quantized_extra_convs=qec,
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
  params = jax.device_put(
      jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params),
      jax.devices()[0],
  )

  kwargs = {}
  if single_res:
    kwargs["refinement_resolutions"] = [(RES, RES)]

  def forward(video, qp):
    out = model.apply(
        {"params": params}, video, qp, query_chunk_size=CHUNK, **kwargs
    )
    return out["tracks"], out["occlusion"], out["expected_dist"]

  t0 = time.perf_counter()
  stats = profiling.benchmark_stats(
      forward, video, qp, iters_per_measure=1, num_measures=3
  )
  print(
      f"{name}: min {stats['min']:.3f}s median {stats['median']:.3f}s "
      f"reps {[round(t, 3) for t in stats['reps']]} "
      f"(compile+bench {time.perf_counter() - t0:.0f}s)",
      flush=True,
  )


def main():
  which = sys.argv[1] if len(sys.argv) > 1 else "all"
  if which in ("all", "fast_qec"):
    run("fast+qec", qec=True, single_res=True)
  if which in ("all", "fast"):
    run("fast", qec=False, single_res=True)
  if which in ("all", "default_qec"):
    run("default+qec", qec=True, single_res=False)


if __name__ == "__main__":
  main()
