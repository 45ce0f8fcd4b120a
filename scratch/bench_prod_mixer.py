"""Per-call time of the production fused mixer block (ops/fused_mixer_block)
at the 480p refinement shape, fp/q8 — tracks the kernel floor after halo and
quantization changes. A 12-block mixer call = 12x this number.
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.ops import fused_mixer_block
from tapnet_tpu.utils import profiling

B, T, C, MULT, K, HID = 128, 250, 512, 4, 3, 2048


def main():
  rng = np.random.RandomState(0)
  dev = jax.devices()[0]

  def arr(*shape, scale=1.0):
    return jax.device_put(
        jnp.asarray(rng.randn(*shape).astype(np.float32) * scale,
                    jnp.bfloat16),
        dev,
    )

  x = arr(B, T, C)
  g1, g2 = arr(C, scale=0.1) + 1.0, arr(C, scale=0.1) + 1.0
  wu, bu = arr(K, 1, MULT * C, scale=0.3), arr(MULT * C, scale=0.1)
  wm, bm = arr(K, 1, MULT * C, scale=0.3), arr(MULT * C, scale=0.1)
  w1, b1 = arr(C, HID, scale=0.05), arr(HID, scale=0.1)
  w2, b2 = arr(HID, C, scale=0.05), arr(C, scale=0.1)

  for name, q in [("fp (bf16)", False), ("q8", True)]:
    sec = profiling.benchmark(
        lambda x: fused_mixer_block.mixer_block(
            x, g1, wu.reshape(K, 1, MULT * C), bu, wm.reshape(K, 1, MULT * C),
            bm, g2, w1, b1, w2, b2, False, None, q,
        ),
        x,
        iters_per_measure=20,
    )
    # MLP flops dominate: 2 matmuls [B*T, C] x [C, HID].
    flops = 2 * 2 * B * T * C * HID
    print(
        f"{name}: {sec * 1e3:.2f} ms/block  "
        f"({flops / sec / 1e12:.0f} TFLOP/s MLP-equiv; "
        f"12-block call {12 * sec * 1e3:.1f} ms)",
        flush=True,
    )


if __name__ == "__main__":
  main()
