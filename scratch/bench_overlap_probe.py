"""Can Mosaic overlap MXU matmuls with independent VPU work on v5e?

Three kernels, same grid (128 steps), same IO:
  mxu   per step: K dots [256,512]x[512,2048] on a resident buffer
  vpu   per step: G gelu+fma passes over an independent [256,2048] buffer
  both  per step: the dots AND the VPU chain, fully independent, textually
        interleaved

If both ~= max(mxu, vpu): the scheduler overlaps; restructuring the mixer
kernel for overlap is worth it. If both ~= mxu + vpu: v5e/Mosaic issue is
effectively serial for this pattern — document and stop chasing overlap.
"""

import functools
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tapnet_tpu.utils import profiling

B, T, C, H = 128, 256, 512, 2048
K_DOTS = 2   # dots per step (mixer has 2 matmuls per block-row)
G_PASSES = 6  # gelu+fma passes per step


def _kernel(x_ref, w_ref, v_ref, y_ref, z_ref, *, mode):
  x = x_ref[0]  # [T, C] bf16
  v = v_ref[0]  # [T, H] bf16 (independent VPU stream)

  acc = None
  if mode in ("mxu", "both", "both_roll"):
    acc = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)

  if mode in ("vpu", "both"):
    vf = v.astype(jnp.float32)
    out = vf
    for _ in range(G_PASSES):
      out = jax.nn.gelu(out) + vf * 0.5
    z_ref[0] = out.astype(v.dtype)
  elif mode in ("vpu_roll", "both_roll"):
    # Mimic the mixer's stage 1: cross-lane LN reductions + sublane rolls
    # + FMAs — do these contend with the MXU where plain gelu does not?
    vf = v.astype(jnp.float32)
    mu = jnp.mean(vf, axis=-1, keepdims=True)
    var = jnp.mean(vf * vf, axis=-1, keepdims=True) - mu * mu
    out = (vf - mu) * jax.lax.rsqrt(var + 1e-5)
    for j in range(1, 7):
      out = out + pltpu.roll(vf, j, axis=0) * 0.1
    z_ref[0] = out.astype(v.dtype)
  else:
    z_ref[0] = v

  if mode in ("mxu", "both", "both_roll"):
    for _ in range(K_DOTS - 1):
      acc = acc + jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    y_ref[0] = acc[:, :C].astype(x.dtype)
  else:
    y_ref[0] = x


def run(x, w, v, mode):
  row = lambda i: (i, 0, 0)
  return pl.pallas_call(
      functools.partial(_kernel, mode=mode),
      grid=(B,),
      in_specs=[
          pl.BlockSpec((1, T, C), row, memory_space=pltpu.VMEM),
          pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((1, T, H), row, memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((1, T, C), row, memory_space=pltpu.VMEM),
          pl.BlockSpec((1, T, H), row, memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((B, T, C), x.dtype),
          jax.ShapeDtypeStruct((B, T, H), v.dtype),
      ],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",),
          vmem_limit_bytes=100 * 1024 * 1024,
      ),
  )(x, w, v)


def main():
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(B, T, C).astype(np.float32)).astype(jnp.bfloat16)
  w = jnp.asarray(rng.randn(C, H).astype(np.float32) * 0.05).astype(
      jnp.bfloat16
  )
  v = jnp.asarray(rng.randn(B, T, H).astype(np.float32)).astype(jnp.bfloat16)

  for mode in ("mxu", "vpu", "both", "vpu_roll", "both_roll"):
    stats = profiling.benchmark_stats(
        lambda a, b, c, m=mode: run(a, b, c, m)[0], x, w, v,
        iters_per_measure=10, num_measures=3,
    )
    print(
        f"{mode:5s} min {stats['min']*1e3:6.2f} ms  "
        f"reps {[round(r*1e3, 2) for r in stats['reps']]}",
        flush=True,
    )


if __name__ == "__main__":
  main()
