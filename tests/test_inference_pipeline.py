"""Pipelined multi-video inference: track_many matches per-video calls."""

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu import inference
from tapnet_tpu.models import tapir as tapir_lib


def small_config():
  return tapir_lib.TapirConfig(
      num_mixer_blocks=2,
      num_pips_iter=2,
      pyramid_level=0,
      initial_resolution=(32, 32),
      blocks_per_group=(1, 1, 1, 1),
  )


class TestTrackMany:

  def test_matches_sequential_calls(self):
    cfg = small_config()
    model = tapir_lib.TAPIR(config=cfg)
    rng = np.random.RandomState(0)
    video0 = jnp.asarray(rng.rand(1, 3, 32, 32, 3) * 2 - 1, jnp.float32)
    qp0 = jnp.asarray(
        np.stack([rng.randint(0, 3, 4), rng.rand(4) * 32, rng.rand(4) * 32],
                 -1)[None],
        jnp.float32,
    )
    params = model.init(
        jax.random.PRNGKey(0), video0, qp0, query_chunk_size=4
    )["params"]
    pred = inference.TapirPredictor(
        params, cfg, query_bucket=4, query_chunk_size=4
    )

    items = []
    for seed in range(3):
      r = np.random.RandomState(seed)
      video = r.rand(1, 3, 32, 32, 3).astype(np.float32) * 2 - 1
      qp = np.stack(
          [r.randint(0, 3, 4), r.rand(4) * 32, r.rand(4) * 32], -1
      )[None].astype(np.float32)
      items.append((video, qp))

    piped = list(pred.track_many(iter(items)))
    assert len(piped) == 3
    for (video, qp), out in zip(items, piped):
      ref = pred(video, qp)
      np.testing.assert_allclose(out["tracks"], ref["tracks"], atol=1e-5)
      np.testing.assert_allclose(
          out["occlusion"], ref["occlusion"], atol=1e-5
      )

  def test_tapnext_chunked_matches_full(self):
    """Time-chunked TAPNext (SSM cache carried across chunks) equals the
    full-sequence forward."""
    from tapnet_tpu.models import ssm_vit
    from tapnet_tpu.models import tapnext as tn

    cfg = ssm_vit.SsmVitConfig(
        width=32, depth=1, mlp_dim=64, num_heads=2,
        patch_size=(1, 16, 16), image_size=(64, 64),
    )
    model = tn.TAPNextTracker(config=cfg)
    r = np.random.RandomState(0)
    video = jnp.asarray(r.rand(1, 10, 64, 64, 3), jnp.float32)
    # Queries in both the first and a later chunk.
    qp = jnp.asarray(
        np.stack([np.array([0.0, 2.0, 6.0, 9.0]), r.rand(4) * 64,
                  r.rand(4) * 64], -1)[None],
        jnp.float32,
    )
    params = model.init(jax.random.PRNGKey(0), video[:, :2], qp)["params"]

    full = inference.TapnextPredictor(params, cfg)(video, qp)
    chunked = inference.TapnextPredictor(params, cfg, chunk_size=4)(
        video, qp
    )
    np.testing.assert_allclose(
        chunked["tracks"], full["tracks"], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        chunked["occlusion"], full["occlusion"], rtol=1e-4, atol=2e-4
    )

  def test_empty_iterable(self):
    cfg = small_config()
    model = tapir_lib.TAPIR(config=cfg)
    video0 = jnp.zeros((1, 3, 32, 32, 3), jnp.float32)
    qp0 = jnp.zeros((1, 4, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), video0, qp0, query_chunk_size=4
    )["params"]
    pred = inference.TapirPredictor(params, cfg, query_bucket=4)
    assert list(pred.track_many(iter([]))) == []
