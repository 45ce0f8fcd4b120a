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
