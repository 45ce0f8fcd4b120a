"""End-to-end 480p fast-config ladder: which opt-in modes buy what.

Measures the north-star workload (250f x 1024q @480p, single-resolution
refinement) with each quantization mode added cumulatively:

  base        bf16, fused kernels (the validated fast config)
  +mixer      quantized_mixer=True
  +extraconvs +quantized_extra_convs=True      (the r3 fast mode, 1.10 s)
  +backbone   +quantized_backbone=True         (new in r4)

Also the default two-resolution config with/without quantized_backbone.
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.utils import profiling

FRAMES, QUERIES, RES, CHUNK = 250, 1024, 480, 128


def make_inputs():
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
  dev = jax.devices()[0]
  return jax.device_put(video, dev), jax.device_put(qp, dev)


def make_params():
  cpu = jax.local_devices(backend="cpu")[0]
  model = tapir_lib.TAPIR(config=tapir_lib.bootstapir_config())
  with jax.default_device(cpu):
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 256, 256, 3), jnp.float32),
        jnp.zeros((1, CHUNK, 3), jnp.float32),
        query_chunk_size=CHUNK,
    )["params"]
  params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
  return jax.device_put(params, jax.devices()[0])


def bench(params, video, qp, single_res, **flags):
  config = tapir_lib.bootstapir_config(compute_dtype="bfloat16", **flags)
  model = tapir_lib.TAPIR(config=config)

  kwargs = (
      dict(refinement_resolutions=[(RES, RES)]) if single_res else {}
  )

  def forward(video, qp):
    out = model.apply(
        {"params": params}, video, qp, query_chunk_size=CHUNK, **kwargs
    )
    return out["tracks"], out["occlusion"], out["expected_dist"]

  stats = profiling.benchmark_stats(
      forward, video, qp, iters_per_measure=1, num_measures=4
  )
  return stats


def main():
  video, qp = make_inputs()
  params = make_params()
  # NOTE: r4 also measured "+backbone" variants (quantized_backbone=True)
  # and found NO end-to-end win (the backbone is HBM-bound, not MXU-bound);
  # the flag was removed from TapirConfig afterwards, so those cases can no
  # longer run at HEAD. Recorded numbers live in PERFORMANCE.md (r4
  # "quantized backbone: measured no-win, removed" entry).
  cases = [
      ("fast/base-bf16", True, {}),
      ("fast/+mixer", True, dict(quantized_mixer=True)),
      ("fast/+extraconvs", True,
       dict(quantized_mixer=True, quantized_extra_convs=True)),
      ("default/bf16+qmixer", False, dict(quantized_mixer=True)),
  ]
  for tag, single, flags in cases:
    stats = bench(params, video, qp, single, **flags)
    print(
        f"{tag:22s} min {stats['min']:.4f} s  "
        f"reps {[round(r, 4) for r in stats['reps']]}",
        flush=True,
    )


if __name__ == "__main__":
  main()
