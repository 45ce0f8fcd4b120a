"""bf16 inference mode: close to fp32, and norm stats stay fp32-stable."""

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu import inference
from tapnet_tpu.models import tapir as tapir_lib

CFG = tapir_lib.TapirConfig(
    num_mixer_blocks=2,
    num_pips_iter=2,
    pyramid_level=0,
    initial_resolution=(32, 40),
    blocks_per_group=(1, 1, 1, 1),
)


def test_bf16_close_to_fp32():
  model = tapir_lib.TAPIR(config=CFG)
  rng = np.random.RandomState(7)
  video = jnp.asarray(rng.rand(1, 4, 32, 40, 3).astype(np.float32) * 2 - 1)
  qp = jnp.asarray(
      np.stack(
          [
              rng.randint(0, 4, (1, 4)).astype(np.float32),
              rng.rand(1, 4) * 32,
              rng.rand(1, 4) * 40,
          ],
          axis=-1,
      )
  )
  params = model.init(jax.random.PRNGKey(0), video, qp)["params"]

  p32 = inference.TapirPredictor(params, CFG, query_bucket=4,
                                 query_chunk_size=4)
  p16 = inference.TapirPredictor(
      params, CFG, query_bucket=4, query_chunk_size=4, bfloat16=True
  )
  o32, o16 = p32(video, qp), p16(video, qp)
  assert np.abs(o32["tracks"] - o16["tracks"]).max() < 1.0  # < 1 px
  assert np.abs(o32["occlusion"] - o16["occlusion"]).max() < 0.5
  assert o16["tracks"].dtype == np.float32


def test_instance_norm_bf16_stats():
  from tapnet_tpu.models.layers import InstanceNorm

  rng = np.random.RandomState(0)
  # Large offset: bf16 statistics would be catastrophically quantized.
  x = (rng.rand(2, 8, 8, 4).astype(np.float32) * 0.01 + 300.0)
  norm = InstanceNorm()
  params = norm.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
  out32 = norm.apply({"params": params}, jnp.asarray(x))
  out16 = norm.apply(
      {"params": params}, jnp.asarray(x, jnp.bfloat16)
  ).astype(jnp.float32)
  # fp32 internal stats keep the normalized output sane even for bf16 input.
  assert np.abs(np.asarray(out16)).max() < 10.0
  assert out16.dtype == jnp.float32


class TestTapnextBf16:
  """TAPNext bf16 matmul mode: same params, tolerance on predictions."""

  def test_bf16_close_to_fp32(self):
    import dataclasses
    from tapnet_tpu.models import ssm_vit, tapnext

    cfg = ssm_vit.variant_config("mu", image_size=(32, 32))
    model = tapnext.TAPNextTracker(config=cfg)
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, 4, 32, 32, 3).astype(np.float32) * 2 - 1)
    queries = jnp.asarray([[[0.0, 8.0, 8.0], [1.0, 24.0, 16.0]]])
    params = model.init(jax.random.PRNGKey(0), video, queries)["params"]
    out32 = model.apply({"params": params}, video, queries)

    cfg16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    out16 = tapnext.TAPNextTracker(config=cfg16).apply(
        {"params": params}, video, queries
    )
    # Positions in a 32px image: bf16 matmuls shift them by well under a px.
    np.testing.assert_allclose(
        np.asarray(out32.tracks), np.asarray(out16.tracks), atol=1.0
    )
    assert out16.tracks.dtype == jnp.float32


def test_quantized_corr_close_to_fp32():
  """quantized_corr (int8 local correlation) end-to-end through TAPIR:
  tracks within ~a pixel of fp32 at tiny scale (CPU takes the quantized
  einsum reference path; the Pallas kernel itself is covered by
  test_corr_tents.py)."""
  import dataclasses

  model = tapir_lib.TAPIR(config=CFG)
  rng = np.random.RandomState(11)
  video = jnp.asarray(rng.rand(1, 4, 32, 40, 3).astype(np.float32) * 2 - 1)
  qp = jnp.asarray(
      np.stack(
          [
              rng.randint(0, 4, (1, 4)).astype(np.float32),
              rng.rand(1, 4) * 32,
              rng.rand(1, 4) * 40,
          ],
          axis=-1,
      )
  )
  params = model.init(jax.random.PRNGKey(0), video, qp)["params"]
  cfg_q = dataclasses.replace(CFG, quantized_corr=True)
  p_fp = inference.TapirPredictor(params, CFG, query_bucket=4,
                                  query_chunk_size=4)
  p_q = inference.TapirPredictor(params, cfg_q, query_bucket=4,
                                 query_chunk_size=4)
  o_fp, o_q = p_fp(video, qp), p_q(video, qp)
  assert np.isfinite(o_q["tracks"]).all()
  assert np.abs(o_fp["tracks"] - o_q["tracks"]).max() < 1.5


def test_per_frame_quantized_corr_model_path():
  """quantized_corr='per_frame' end-to-end: the hoisted pre-quantization
  path produces tracks close to fp32 and identical-shape outputs."""
  import dataclasses

  model_cfg = dataclasses.replace(CFG, quantized_corr="per_frame")
  model = tapir_lib.TAPIR(config=model_cfg)
  rng = np.random.RandomState(12)
  video = jnp.asarray(rng.rand(1, 4, 32, 40, 3).astype(np.float32) * 2 - 1)
  qp = jnp.asarray(
      np.stack(
          [
              rng.randint(0, 4, (1, 4)).astype(np.float32),
              rng.rand(1, 4) * 32,
              rng.rand(1, 4) * 40,
          ],
          axis=-1,
      )
  )
  params = tapir_lib.TAPIR(config=CFG).init(
      jax.random.PRNGKey(0), video, qp
  )["params"]
  p_fp = inference.TapirPredictor(params, CFG, query_bucket=4,
                                  query_chunk_size=4)
  p_q = inference.TapirPredictor(params, model_cfg, query_bucket=4,
                                 query_chunk_size=4)
  o_fp, o_q = p_fp(video, qp), p_q(video, qp)
  assert np.isfinite(o_q["tracks"]).all()
  assert np.abs(o_fp["tracks"] - o_q["tracks"]).max() < 1.5
