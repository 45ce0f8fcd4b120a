import sys
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scratch")
import instance_norm as in_ops
from tapnet_tpu.utils import profiling

for shape in [(250, 240, 240, 64), (250, 120, 120, 128), (250, 60, 60, 256)]:
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2 + 1).astype(jnp.bfloat16)
  s = jnp.asarray(rng.rand(shape[-1]).astype(np.float32) + 0.5)
  o = jnp.asarray(rng.randn(shape[-1]).astype(np.float32) * 0.2)
  st_f = profiling.benchmark_stats(lambda x: in_ops._pallas_forward(x, s, o, True, 1e-5), x, iters_per_measure=10, num_measures=2)
  st_r = profiling.benchmark_stats(lambda x: jax.nn.relu(in_ops._math_reference(x, s, o, False, 1e-5)), x, iters_per_measure=10, num_measures=2)
  print(f"{shape}: fused {st_f['min']*1e3:.2f} ms vs xla(norm+relu) {st_r['min']*1e3:.2f} ms", flush=True)
