"""Track drift introduced by w8a8 ExtraConvs at the fast 480p config.

Both runs use identical params with the zero-init conv_out kernels perturbed
(otherwise ExtraConvs is a no-op at init and quantization error is trivially
zero); the only difference is quantized_extra_convs. The int8 mixer is ON in
both, so the reported drift isolates the conv quantization.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tapnet_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tapnet_tpu.models import tapir as tapir_lib

FRAMES, QUERIES, RES, CHUNK = 250, 1024, 480, 128


def make_params(model):
  cpu = jax.local_devices(backend="cpu")[0]
  with jax.default_device(cpu):
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, 256, 256, 3), jnp.float32),
        jnp.zeros((1, CHUNK, 3), jnp.float32),
        query_chunk_size=CHUNK,
    )["params"]
  # Perturb the zero-init conv_out kernels so ExtraConvs actually
  # contributes (scale comparable to a trained residual branch).
  rng = np.random.RandomState(7)

  def perturb(path, x):
    name = "/".join(str(p) for p in path)
    if "conv_out" in name and x.ndim == 4:
      return x + jnp.asarray(
          rng.randn(*x.shape).astype(np.float32) * 0.02
      )
    return x

  params = jax.tree_util.tree_map_with_path(perturb, params)
  params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
  return jax.device_put(params, jax.devices()[0])


def run(params, qec):
  config = tapir_lib.bootstapir_config(
      compute_dtype="bfloat16",
      quantized_mixer=True,
      quantized_extra_convs=qec,
  )
  model = tapir_lib.TAPIR(config=config)
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

  @jax.jit
  def forward(video, qp):
    out = model.apply(
        {"params": params}, video, qp, query_chunk_size=CHUNK,
        refinement_resolutions=[(RES, RES)],
    )
    # unrefined_tracks[0] is the stage-1 cost-volume localization before
    # any refinement iteration.
    return out["tracks"], out["occlusion"], out["unrefined_tracks"][0]

  video = jax.device_put(video, jax.devices()[0])
  qp = jax.device_put(qp, jax.devices()[0])
  t0 = time.perf_counter()
  out = forward(video, qp)
  jax.block_until_ready(out)
  print(f"qec={qec} compile+run {time.perf_counter()-t0:.1f}s", flush=True)
  return tuple(np.asarray(o, np.float32) for o in out)


def main():
  import sys

  mode = sys.argv[1] if len(sys.argv) > 1 else "True"
  qec = {"True": True, "per_pixel": "per_pixel"}[mode]
  print(f"=== quantized_extra_convs={qec!r} vs full precision ===",
        flush=True)
  model = tapir_lib.TAPIR(config=tapir_lib.bootstapir_config())
  params = make_params(model)
  tr_f, occ_f, s1_f = run(params, False)
  tr_q, occ_q, s1_q = run(params, qec)
  dpos = np.linalg.norm(tr_q - tr_f, axis=-1)
  print(
      f"track drift px @480p (qec vs fp convs): mean {dpos.mean():.3f} "
      f"p50 {np.percentile(dpos, 50):.3f} p95 {np.percentile(dpos, 95):.3f} "
      f"max {dpos.max():.2f}",
      flush=True,
  )
  # Drift restricted to points both configs predict visible: position is
  # ill-defined for occluded points (the reference metrics only score
  # visible points), so the interesting number excludes them.
  vis = (occ_f < 0) & (occ_q < 0)
  dv = dpos[vis]
  print(
      f"visible-only drift ({vis.mean()*100:.1f}% of points): "
      f"mean {dv.mean():.3f} p95 {np.percentile(dv, 95):.3f} "
      f"max {dv.max():.2f}",
      flush=True,
  )
  for thr in (1.0, 8.0, 48.0):
    print(
        f"  frac all-points drift > {thr:g}px: {(dpos > thr).mean()*100:.3f}%"
        f"   visible-only: {(dv > thr).mean()*100:.3f}%",
        flush=True,
    )
  # Outlier mechanism check: if the big-drift points already disagree at
  # stage 1 (pre-refinement cost-volume argmax), the tail is near-tied
  # argmax flips on random features, not refinement instability.
  ds1 = np.linalg.norm(s1_q - s1_f, axis=-1)
  big = dpos > 8.0
  if big.any():
    print(
        f"stage-1 drift on the >8px tail ({big.sum()} point-frames): "
        f"p50 {np.percentile(ds1[big], 50):.2f}px "
        f"frac >8px already at stage 1: {(ds1[big] > 8).mean()*100:.1f}%",
        flush=True,
    )
  flips = ((occ_f < 0) != (occ_q < 0)).mean()
  print(
      f"occlusion-logit drift: mean {np.abs(occ_q - occ_f).mean():.4f} "
      f"max {np.abs(occ_q - occ_f).max():.3f}; "
      f"visibility flips: {flips*100:.3f}% of point-frames",
      flush=True,
  )
  # Does the model's own confidence flag the catastrophic tail? TAPIR's
  # visibility = (1-sig(occ))*(1-sig(expd)) > 0.5 (reference
  # model_utils.py:376-389); if the >48px flips carry low fp-config
  # confidence, production filtering already discards them.
  conf_f = (1.0 / (1.0 + np.exp(occ_f)))  # P(visible) per fp occ logit
  tail = dpos > 48.0
  if tail.any():
    print(
        f"fp-config P(visible) on the >48px tail: "
        f"p50 {np.percentile(conf_f[tail], 50):.3f} "
        f"p90 {np.percentile(conf_f[tail], 90):.3f} "
        f"(all points p50 {np.percentile(conf_f, 50):.3f}); "
        f"frac of tail fp-visible: {(occ_f[tail] < 0).mean()*100:.1f}%",
        flush=True,
    )


if __name__ == "__main__":
  main()
