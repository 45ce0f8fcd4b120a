"""A/B bench of the fused mixer-block kernel at the 480p production shape.

Measures 12 sequential mixer_block calls on [128, 256(valid 250), 512] bf16
— the shape the 480p BootsTAPIR pipeline runs 64 times. Run once on the
working tree and once on HEAD to price a kernel change.

Usage: python scratch/bench_halo_mixer.py [label]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.ops import fused_mixer_block as fmb
from tapnet_tpu.utils import profiling

B, T, TREAL, C = 128, 256, 250, 512
MULT, K, MLP = 4, 3, 4


def make_params(rng):
  def p(*shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.02)

  return dict(
      g1=jnp.ones((C,)), wu=p(K, C * MULT), bu=p(C * MULT),
      wm=p(K, C * MULT), bm=p(C * MULT), g2=jnp.ones((C,)),
      w1=p(C, MLP * C), b1=p(MLP * C), w2=p(MLP * C, C), b2=p(C),
  )


def main():
  label = sys.argv[1] if len(sys.argv) == 2 else "worktree"
  if len(sys.argv) > 2:
    raise SystemExit(f"usage: {sys.argv[0]} [label]")
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(B, T, C).astype(np.float32)).astype(jnp.bfloat16)
  params = [make_params(rng) for _ in range(12)]
  bf16 = {
      k: jax.tree.map(lambda v: v.astype(jnp.bfloat16), pp)
      for k, pp in enumerate(params)
  }

  def twelve(x):
    for i in range(12):
      pp = bf16[i]
      x = fmb.mixer_block(
          x, pp["g1"], pp["wu"], pp["bu"], pp["wm"], pp["bm"], pp["g2"],
          pp["w1"], pp["b1"], pp["w2"], pp["b2"], causal=False,
          valid_len=TREAL,
      )
    return x

  stats = profiling.benchmark_stats(twelve, x, iters_per_measure=20)
  print(f"[{label}] 12-block mixer call [B={B}, T={T} (valid {TREAL}), "
        f"C={C}]: min {stats['min']*1e3:.2f} ms median "
        f"{stats['median']*1e3:.2f} ms reps "
        f"{[round(r*1e3, 2) for r in stats['reps']]}")

  # Numerics vs the jnp reference at fp32-ish tolerance for bf16 IO.
  pp = bf16[0]
  y_k = fmb._pallas_forward(
      x, pp["g1"], pp["wu"], pp["bu"], pp["wm"], pp["bm"], pp["g2"],
      pp["w1"], pp["b1"], pp["w2"], pp["b2"], False, TREAL,
  )
  y_r = fmb._math_reference(
      x, pp["g1"], pp["wu"], pp["bu"], pp["wm"], pp["bm"], pp["g2"],
      pp["w1"], pp["b1"], pp["w2"], pp["b2"], False, TREAL,
  )
  d = jnp.abs(y_k[:, :TREAL].astype(jnp.float32)
              - y_r[:, :TREAL].astype(jnp.float32))
  print(f"[{label}] max|kernel - reference| = {float(d.max()):.3e}")


if __name__ == "__main__":
  main()
