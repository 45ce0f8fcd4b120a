"""TAPNext long-video: 1024 frames @256^2 via the chunked predictor."""
import sys, time
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from tapnet_tpu.models import ssm_vit, tapnext
from tapnet_tpu import inference

T, N_POINTS, RES, CHUNK = 1024, 64, 256, 64
cfg = ssm_vit.SsmVitConfig(compute_dtype="bfloat16")
model = tapnext.TAPNextTracker(config=cfg)
rng = np.random.RandomState(0)
video = jax.device_put(jnp.asarray(rng.rand(1, T, RES, RES, 3).astype(np.float32)), jax.devices()[0])
qp = np.stack([np.zeros(N_POINTS), rng.rand(N_POINTS)*RES,
               rng.rand(N_POINTS)*RES], -1)[None].astype(np.float32)
cpu = jax.local_devices(backend="cpu")[0]
with jax.default_device(cpu):
  params = model.init(jax.random.PRNGKey(0), jnp.asarray(video[:, :2]),
                      jnp.asarray(qp))["params"]
params = jax.device_put(params, jax.devices()[0])

pred = inference.TapnextPredictor(params, cfg, chunk_size=CHUNK)
t0 = time.perf_counter()
out = pred(video, qp)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
for i in range(2):
  t0 = time.perf_counter()
  out = pred(video, qp)
  dt = time.perf_counter()-t0
  print(f"run {i}: {dt:.2f}s  ({T/dt:.1f} frames/s, "
        f"{N_POINTS*T/dt:.0f} points-frames/s)  tracks {out['tracks'].shape}",
        flush=True)
