"""Query-chunk sweep for the fast 480p int8 config (fused kernels).

The r1 sweep (2.54 s @128 vs 2.60 @256) predates the fused mixer/corr
kernels, whose per-call fixed costs (weight DMA, grid ramp) halve with
chunk 256. Re-measure, plus the per_pixel ExtraConvs mode at chunk 128.
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.utils import profiling

FRAMES, QUERIES, RES = 250, 1024, 480


def main():
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
  model0 = tapir_lib.TAPIR(config=tapir_lib.bootstapir_config())
  with jax.default_device(cpu):
    params = model0.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 256, 256, 3), jnp.float32),
        jnp.zeros((1, 128, 3), jnp.float32),
        query_chunk_size=128,
    )["params"]
  params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
  params = jax.device_put(params, jax.devices()[0])
  dev = jax.devices()[0]
  video = jax.device_put(video, dev)
  qp = jax.device_put(qp, dev)

  cases = [
      ("chunk128/qec=frame", 128, True),
      ("chunk256/qec=frame", 256, True),
      ("chunk512/qec=frame", 512, True),
      ("chunk128/qec=pixel", 128, "per_pixel"),
  ]
  for tag, chunk, qec in cases:
    config = tapir_lib.bootstapir_config(
        compute_dtype="bfloat16",
        quantized_mixer=True,
        quantized_extra_convs=qec,
    )
    model = tapir_lib.TAPIR(config=config)

    def fwd(video, qp, params, model=model, chunk=chunk):
      out = model.apply(
          {"params": params}, video, qp, query_chunk_size=chunk,
          refinement_resolutions=[(RES, RES)],
      )
      return out["tracks"], out["occlusion"], out["expected_dist"]

    stats = profiling.benchmark_stats(
        fwd, video, qp, params, iters_per_measure=1, num_measures=4
    )
    print(
        f"{tag:20s} min {stats['min']:.4f} s  "
        f"reps {[round(r, 4) for r in stats['reps']]}",
        flush=True,
    )


if __name__ == "__main__":
  main()
