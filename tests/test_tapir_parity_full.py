"""Full-size TAPIR parity burn-in (slow; select with `-m slow`).

The regular parity suite (test_tapir_parity.py) runs tiny configs; this file
burns in the PRODUCTION graphs — the configurations bench.py times and
released checkpoints target — against the reference Haiku oracle at fp32:

  * standard TAPIR (reference tapir_model.py:296-332 defaults,
    configs/tapir_config.py): 12 mixer blocks, ResNet-18 (2,2,2,2),
    256x256, pyramid_level 0;
  * BootsTAPIR (configs/tapir_bootstrap_config.py): extra_convs,
    softmax_temperature 10, pyramid_level 1.

Random reference weights -> checkpoint converter -> full forward on a
256x256 clip, tracks within 1e-4-grade tolerances at fp32. This is the
strongest AJ-parity evidence available without the DAVIS pickles: identical
fp32 outputs on the production graph imply identical benchmark metrics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.checkpoints.tapir_checkpoint import convert_haiku_tapir_params
from tapnet_tpu.models import tapir as tapir_lib

try:
  import haiku as hk
  from tapnet.models import tapir_model as ref_tapir

  HAS_REF = True
except Exception:
  HAS_REF = False

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not HAS_REF, reason="reference oracle not importable"),
]

B, T, H, W, N = 1, 4, 256, 256, 4
CHUNK = 4


def make_inputs():
  rng = np.random.RandomState(7)
  video = jnp.asarray(
      rng.rand(B, T, H, W, 3).astype(np.float32) * 2.0 - 1.0
  )
  qp = jnp.asarray(
      np.stack(
          [
              rng.randint(0, T, N).astype(np.float32),
              rng.rand(N) * (H - 16) + 8,
              rng.rand(N) * (W - 16) + 8,
          ],
          axis=-1,
      )[None]
  )
  return video, qp


def run_pair(ref_kwargs, our_config):
  video, qp = make_inputs()

  def fwd(video, qp):
    model = ref_tapir.TAPIR(**ref_kwargs)
    return model(
        video, is_training=False, query_points=qp, query_chunk_size=CHUNK
    )

  transformed = hk.transform_with_state(fwd)
  ref_params, ref_state = transformed.init(jax.random.PRNGKey(0), video, qp)
  assert not ref_state
  ref_out, _ = transformed.apply(
      ref_params, {}, jax.random.PRNGKey(42), video, qp
  )

  our_model = tapir_lib.TAPIR(config=our_config)
  our_params = convert_haiku_tapir_params(
      jax.tree_util.tree_map(np.asarray, dict(ref_params))
  )
  our_out = our_model.apply(
      {"params": our_params}, video, qp, query_chunk_size=CHUNK
  )
  return ref_out, our_out


def assert_outputs_match(ref_out, our_out):
  # Final refined prediction (what the benchmarks score). fp32 drift over
  # the 12-block mixer and ResNet-18 at 256^2 measures ~1e-5-grade on
  # positions (pixel units) and logits.
  np.testing.assert_allclose(
      np.asarray(our_out["tracks"][-1]),
      np.asarray(ref_out["tracks"][-1]),
      rtol=1e-4,
      atol=1e-3,
  )
  np.testing.assert_allclose(
      np.asarray(our_out["occlusion"][-1]),
      np.asarray(ref_out["occlusion"][-1]),
      rtol=1e-4,
      atol=1e-3,
  )
  np.testing.assert_allclose(
      np.asarray(our_out["expected_dist"][-1]),
      np.asarray(ref_out["expected_dist"][-1]),
      rtol=1e-4,
      atol=1e-3,
  )
  # Every intermediate iteration too (the training loss supervises them).
  for i, (ours, theirs) in enumerate(
      zip(our_out["tracks"], ref_out["tracks"])
  ):
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(theirs), rtol=1e-3, atol=5e-3,
        err_msg=f"iteration {i}",
    )


class TestProductionTapirParity:

  def test_standard_tapir_full_config(self):
    ref_out, our_out = run_pair(
        dict(pyramid_level=0, use_causal_conv=False),
        tapir_lib.tapir_config(),
    )
    assert_outputs_match(ref_out, our_out)

  def test_bootstapir_full_config(self):
    ref_out, our_out = run_pair(
        dict(
            pyramid_level=1,
            use_causal_conv=False,
            extra_convs=True,
            softmax_temperature=10.0,
        ),
        tapir_lib.bootstapir_config(),
    )
    assert_outputs_match(ref_out, our_out)
