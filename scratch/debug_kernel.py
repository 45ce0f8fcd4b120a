"""Get the real Mosaic error for the fused mixer block kernel."""
import sys
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")
import bench_mixer_kernel as bk

rng = np.random.RandomState(0)
C, H, K, MULT = 512, 2048, 3, 4
xb = jnp.asarray(rng.randn(16, 250, C) * 0.3, jnp.bfloat16)
args = (
    jnp.asarray(rng.rand(C), jnp.bfloat16),
    jnp.asarray(rng.randn(K, C, MULT) * 0.2, jnp.bfloat16),
    jnp.asarray(rng.randn(C, MULT) * 0.01, jnp.bfloat16),
    jnp.asarray(rng.randn(K, C, MULT) * 0.2, jnp.bfloat16),
    jnp.asarray(rng.randn(C, MULT) * 0.01, jnp.bfloat16),
    jnp.asarray(rng.rand(C), jnp.bfloat16),
    jnp.asarray(rng.randn(C, H) * 0.02, jnp.bfloat16),
    jnp.asarray(rng.randn(H) * 0.01, jnp.bfloat16),
    jnp.asarray(rng.randn(H, C) * 0.02, jnp.bfloat16),
    jnp.asarray(rng.randn(C) * 0.01, jnp.bfloat16),
)
try:
  out = jax.jit(lambda x, *w: bk.fused_block(x, *w, rb=4))(xb, *args)
  out.block_until_ready()
  print("rb=4 compiled and ran, out", out.shape, out.dtype)
except Exception as e:
  print(f"FAILED: {type(e).__name__}")
  print(str(e)[:6000])
