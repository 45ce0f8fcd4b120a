"""TAP-Net / TSM-ResNet parity against the reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.checkpoints.tapnet_checkpoint import convert_haiku_tapnet
from tapnet_tpu.models import tapnet as tapnet_lib
from tapnet_tpu.models import tsm_resnet

try:
  import haiku as hk
  from tapnet.models import tapnet_model as ref_tapnet
  from tapnet.models import tsm_utils as ref_tsmu

  HAS_REF = True
except Exception:
  HAS_REF = False

pytestmark = pytest.mark.skipif(
    not HAS_REF, reason="reference oracle not importable"
)

B, T, H, W, N = 1, 3, 32, 32, 4


class TestTemporalShift:

  def test_matches_reference_tpu_mode(self):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(T * 2, 4, 4, 16).astype(np.float32))
    ref = ref_tsmu.apply_temporal_shift(
        x, tsm_mode="tpu", num_frames=T, channel_shift_fraction=0.125
    )
    ours = tsm_resnet.temporal_shift(x, T, 0.125)
    # The reference TPU path casts to bfloat16 internally (tsm_utils.py:180);
    # ours stays fp32 (and matches the reference's fp32 GPU path exactly,
    # see the next test), so only bf16-level agreement is expected here.
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ours), atol=4e-3)

  def test_matches_reference_gpu_mode(self):
    """GPU mode operates on [B*T, ...] batch-major; ours is time-major.
    Verify equivalence through the layout transpose."""
    rng = np.random.RandomState(1)
    b = 2
    x_bt = jnp.asarray(rng.rand(b, T, 4, 4, 16).astype(np.float32))
    ref = ref_tsmu.apply_temporal_shift(
        x_bt.reshape(b * T, 4, 4, 16),
        tsm_mode="gpu",
        num_frames=T,
        channel_shift_fraction=0.125,
    ).reshape(b, T, 4, 4, 16)
    x_tb = x_bt.transpose(1, 0, 2, 3, 4).reshape(T * b, 4, 4, 16)
    ours = tsm_resnet.temporal_shift(x_tb, T, 0.125)
    ours = ours.reshape(T, b, 4, 4, 16).transpose(1, 0, 2, 3, 4)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ours), atol=1e-6)


class TestTapNetParity:

  def test_forward_matches_reference(self):
    rng = np.random.RandomState(7)
    video = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1)
    qp = jnp.asarray(
        np.stack(
            [
                rng.randint(0, T, (B, N)).astype(np.float32),
                rng.rand(B, N) * H,
                rng.rand(B, N) * W,
            ],
            axis=-1,
        )
    )

    def fwd(video, qp, is_training):
      m = ref_tapnet.TAPNet(cross_replica_axis=None, num_frames=T)
      return m(
          video,
          is_training=is_training,
          query_points=qp,
          query_chunk_size=N,
      )

    tf = hk.transform_with_state(fwd)
    ref_params, ref_state = tf.init(jax.random.PRNGKey(0), video, qp, True)
    ref_out, _ = tf.apply(
        ref_params, ref_state, jax.random.PRNGKey(1), video, qp, False
    )

    params, batch_stats = convert_haiku_tapnet(
        jax.tree_util.tree_map(np.asarray, dict(ref_params)),
        jax.tree_util.tree_map(np.asarray, dict(ref_state)),
    )
    model = tapnet_lib.TAPNet()
    our_out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        video,
        qp,
        query_chunk_size=N,
    )
    np.testing.assert_allclose(
        np.asarray(ref_out["tracks"]),
        np.asarray(our_out["tracks"]),
        atol=5e-3,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ref_out["occlusion"]),
        np.asarray(our_out["occlusion"]),
        atol=5e-3,
        rtol=1e-4,
    )
