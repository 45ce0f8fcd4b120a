"""Per-frame device latency of the two streaming trackers (BASELINE
configs 2 and 4): causal TAPIR and TAPNext online steps at 256x256.

Times the jitted per-frame step on-device with profiling.benchmark (the
step runs inside one jit'd loop, so host->device dispatch RTT — which the
remote-TPU tunnel inflates to ~1 s — is excluded; a colocated host pays
~100 us of dispatch on top of these numbers).
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import ssm_vit, tapir as tapir_lib, tapnext
from tapnet_tpu.utils import profiling

N_POINTS = 64
RES = 256


def cpu_init(model, *args, **kwargs):
  cpu = jax.local_devices(backend="cpu")[0]
  with jax.default_device(cpu):
    params = model.init(jax.random.PRNGKey(0), *args, **kwargs)["params"]
  params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
  return jax.device_put(params, jax.devices()[0])


def bench_causal_tapir():
  cfg = tapir_lib.causal_tapir_config(compute_dtype="bfloat16")
  model = tapir_lib.TAPIR(config=cfg)
  rng = np.random.RandomState(0)
  frame = jnp.asarray(rng.rand(1, 1, RES, RES, 3) * 2 - 1, jnp.float32)
  qp = jnp.asarray(
      np.stack([np.zeros(N_POINTS), rng.rand(N_POINTS) * RES,
                rng.rand(N_POINTS) * RES], -1)[None], jnp.float32)
  params = cpu_init(model, frame, qp, query_chunk_size=N_POINTS)

  grids = model.apply({"params": params}, frame,
                      method=tapir_lib.TAPIR.get_feature_grids)
  qf = model.apply({"params": params}, frame.shape, qp, grids,
                   method=tapir_lib.TAPIR.get_query_features)
  state = model.apply({"params": params}, 1, N_POINTS, 1,
                      method=tapir_lib.TAPIR.construct_initial_causal_state)

  def step(frame, qf, state):
    g = model.apply({"params": params}, frame,
                    method=tapir_lib.TAPIR.get_feature_grids)
    out = model.apply(
        {"params": params}, frame.shape[-3:-1], g, qf, None, None, state,
        True, method=tapir_lib.TAPIR.estimate_trajectories)
    p = cfg.num_pips_iter
    return (jnp.mean(jnp.stack(out["tracks"][p::p]), axis=0),
            out["causal_context"])

  t = profiling.benchmark(step, frame, qf, state, iters_per_measure=20)
  print(f"causal TAPIR  {N_POINTS:4d} pts @{RES}^2: "
        f"{t*1e3:7.2f} ms/frame  ({1/t:6.1f} fps, "
        f"{N_POINTS/t:9.0f} points-frames/s)", flush=True)


def bench_tapnext():
  # NOTE: params must be ARGUMENTS of the jitted functions, not closures —
  # closed-over arrays are inlined into the serialized HLO as constants
  # (ViT-B: ~400 MB, which breaks remote compile outright).
  import time

  cfg = ssm_vit.SsmVitConfig(compute_dtype="bfloat16")
  model = tapnext.TAPNextTracker(config=cfg)
  rng = np.random.RandomState(0)
  frames0 = jnp.asarray(rng.rand(1, 1, RES, RES, 3), jnp.float32)
  qp = jnp.asarray(
      np.stack([np.zeros(N_POINTS), rng.rand(N_POINTS) * RES,
                rng.rand(N_POINTS) * RES], -1)[None], jnp.float32)
  cpu = jax.local_devices(backend="cpu")[0]
  with jax.default_device(cpu):
    params = model.init(jax.random.PRNGKey(0), frames0, qp)["params"]
  params = jax.device_put(params, jax.devices()[0])
  steps = 20

  @jax.jit
  def init_fn(params, frames, qp):
    res = model.apply({"params": params}, frames, qp,
                      method=tapnext.TAPNextTracker.forward_step)
    return res.state

  @jax.jit
  def rollout(params, frame, state):
    def step(carry, _):
      state, f = carry
      res = model.apply({"params": params}, f, None, None, state,
                        method=tapnext.TAPNextTracker.forward_step)
      # Perturbation that underflows to zero keeps the body loop-variant.
      f2 = f + jnp.float32(1e-45) * jnp.sum(res.tracks).astype(jnp.float32)
      return (res.state, f2), res.tracks
    (state, _), tracks = jax.lax.scan(
        step, (state, frame), None, length=steps)
    return tracks

  state = init_fn(params, frames0, qp)
  out = rollout(params, frames0, state)
  jax.block_until_ready(out)
  best = 1e9
  for _ in range(3):
    t0 = time.perf_counter()
    out = rollout(params, frames0, state)
    jax.block_until_ready(out)
    best = min(best, (time.perf_counter() - t0) / steps)
  print(f"TAPNext online {N_POINTS:3d} pts @{RES}^2: "
        f"{best*1e3:7.2f} ms/frame  ({1/best:6.1f} fps, "
        f"{N_POINTS/best:9.0f} points-frames/s)", flush=True)


if __name__ == "__main__":
  bench_causal_tapir()
  bench_tapnext()
