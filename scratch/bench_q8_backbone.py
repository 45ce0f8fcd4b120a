"""TAPIR backbone (ResNet-18 v2 + InstanceNorm) fp vs w8a8 int8 at the
480p north-star workload: 250 frames x 480x480.

The fast 480p xprof breakdown attributes ~0.32 s to backbone convolution
fusions; if the ResNet convs hit the ~1.7x int8 rate the ExtraConvs stack
measured, the end-to-end fast config crosses under 1 s.

Usage: python scratch/bench_q8_backbone.py [frames [res]]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import resnet as resnet_lib
from tapnet_tpu.utils import profiling

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 250
RES = int(sys.argv[2]) if len(sys.argv) > 2 else 480


def main():
  rng = np.random.RandomState(0)
  x = jnp.asarray(
      rng.rand(FRAMES, RES, RES, 3).astype(np.float32) * 2 - 1,
      jnp.bfloat16,
  )

  cpu = jax.local_devices(backend="cpu")[0]
  results = {}
  for name, quantized in [("bf16", False), ("int8", True)]:
    cfg = resnet_lib.ResNetConfig(
        channels_per_group=(64, 128, 256, 256), quantized=quantized
    )
    model = resnet_lib.ResNet(config=cfg)
    with jax.default_device(cpu):
      # Init the fp model (init through the int8 CPU path is glacial);
      # the param tree is identical across modes.
      if "params" not in results:
        fp = resnet_lib.ResNet(
            config=resnet_lib.ResNetConfig(
                channels_per_group=(64, 128, 256, 256)
            )
        )
        results["params"] = fp.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )["params"]
    params = jax.tree_util.tree_map(
        lambda a: jax.device_put(a.astype(jnp.bfloat16), jax.devices()[0]),
        results["params"],
    )
    xd = jax.device_put(x, jax.devices()[0])

    def fwd(v, params=params, model=model):
      out = model.apply({"params": params}, v)
      return out["group_1"], out["group_3"]

    t0 = time.perf_counter()
    sec = profiling.benchmark(fwd, xd, iters_per_measure=4)
    print(
        f"{name}: {sec * 1e3:.2f} ms per {FRAMES}f@{RES} forward "
        f"(compile+bench {time.perf_counter() - t0:.1f}s)",
        flush=True,
    )
    results[name] = sec

  print(f"speedup: {results['bf16'] / results['int8']:.2f}x")


if __name__ == "__main__":
  main()
