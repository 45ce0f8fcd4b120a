"""TAPNext tests: checkpoint key layout, query embedding semantics,
offline-vs-streaming consistency, head decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.checkpoints import tapnext_checkpoint
from tapnet_tpu.models import ssm_vit, tapnext

TINY = ssm_vit.SsmVitConfig(
    width=32,
    depth=2,
    mlp_dim=64,
    num_heads=2,
    patch_size=(1, 8, 8),
    image_size=(32, 32),
)

B, T, Q = 1, 5, 3


@pytest.fixture(scope="module")
def tracker_and_params():
  model = tapnext.TAPNextTracker(config=TINY)
  video = jnp.zeros((B, T, 32, 32, 3))
  qp = jnp.zeros((B, Q, 3))
  params = model.init(jax.random.PRNGKey(0), video, qp)["params"]
  return model, params


class TestCheckpointLayout:

  def test_param_keys_match_released_format(self, tracker_and_params):
    """The exact key paths the reference torch converter reads
    (tapnext_torch_utils.py:60-204) must exist in our tree."""
    _, params = tracker_and_params
    flat = tapnext_checkpoint.flatten(
        jax.tree_util.tree_map(np.asarray, params)
    )
    expected = [
        "backbone/embedding/kernel",
        "backbone/embedding/bias",
        "backbone/mask_token",
        "backbone/unknown_token",
        "backbone/point_query_token",
        "backbone/pos_embedding",
        "backbone/pos_embedding_full",
        "backbone/Transformer/encoder_norm/scale",
        "backbone/Transformer/encoder_norm/bias",
        "backbone/Transformer/encoderblock_0/ssm_block/temporal_pre_norm/scale",
        "backbone/Transformer/encoderblock_0/ssm_block/recurrent_block/linear_y/kernel",
        "backbone/Transformer/encoderblock_0/ssm_block/recurrent_block/conv_1d/w",
        "backbone/Transformer/encoderblock_0/ssm_block/recurrent_block/rg_lru/a_param",
        "backbone/Transformer/encoderblock_0/ssm_block/recurrent_block/rg_lru/input_gate/w",
        "backbone/Transformer/encoderblock_0/ssm_block/mlp_block/ffw_up/w",
        "backbone/Transformer/encoderblock_0/ssm_block/mlp_block/ffw_down/kernel",
        "backbone/Transformer/encoderblock_0/vit_block/LayerNorm_0/scale",
        "backbone/Transformer/encoderblock_0/vit_block/MultiHeadDotProductAttention_0/query/kernel",
        "backbone/Transformer/encoderblock_0/vit_block/MultiHeadDotProductAttention_0/out/kernel",
        "backbone/Transformer/encoderblock_0/vit_block/MlpBlock_0/Dense_0/kernel",
        "backbone/Transformer/encoderblock_1/vit_block/LayerNorm_1/scale",
        "visible_head/layers_0/kernel",
        "visible_head/layers_1/scale",
        "visible_head/layers_3/kernel",
        "visible_head/layers_4/scale",
        "visible_head/layers_6/kernel",
        "coordinate_head/layers_0/kernel",
        "coordinate_head/layers_6/bias",
    ]
    missing = [k for k in expected if k not in flat]
    assert not missing, f"missing checkpoint keys: {missing}"

  def test_npz_round_trip(self, tracker_and_params, tmp_path):
    _, params = tracker_and_params
    path = str(tmp_path / "ckpt.npz")
    tapnext_checkpoint.save_tapnext_checkpoint(path, params)
    restored = tapnext_checkpoint.load_tapnext_checkpoint(path)
    orig_flat = tapnext_checkpoint.flatten(
        jax.tree_util.tree_map(np.asarray, params)
    )
    new_flat = tapnext_checkpoint.flatten(restored)
    assert set(orig_flat) == set(new_flat)
    for k in orig_flat:
      np.testing.assert_array_equal(orig_flat[k], new_flat[k])


class TestQueryEmbedding:

  def test_token_placement(self, tracker_and_params):
    """Reproduces the docstring schema: [U] before the query frame, [XY] at
    it, [M] after (ssm_vit.py reference:451-463)."""
    model, params = tracker_and_params
    backbone = ssm_vit.MaskedSequenceDecoder(config=TINY)
    bb_params = params["backbone"]

    qp = jnp.asarray([[[0.0, 8.0, 8.0], [2.0, 16.0, 16.0]]])  # [1, 2, 3]
    tokens = backbone.apply(
        {"params": bb_params},
        T,
        qp[..., None, :],
        jnp.ones((1, 2, 1)),
        method=ssm_vit.MaskedSequenceDecoder.embed_queries_and_hints,
    )  # [1, T, 2, c]

    mask_tok = np.asarray(bb_params["mask_token"])[0, 0, 0]
    unk_tok = np.asarray(bb_params["unknown_token"])[0, 0]

    # Track 0: query at t=0 -> [XY] at 0 (not mask), [M] at 1..4.
    assert not np.allclose(tokens[0, 0, 0], mask_tok)
    for t in range(1, T):
      np.testing.assert_allclose(tokens[0, t, 0], mask_tok)
    # Track 1: query at t=2 -> [U] at 0, 1; [XY] at 2; [M] at 3, 4.
    np.testing.assert_allclose(tokens[0, 0, 1], unk_tok)
    np.testing.assert_allclose(tokens[0, 1, 1], unk_tok)
    assert not np.allclose(tokens[0, 2, 1], mask_tok)
    assert not np.allclose(tokens[0, 2, 1], unk_tok)
    np.testing.assert_allclose(tokens[0, 3, 1], mask_tok)

  def test_multi_hint_overrides(self, tracker_and_params):
    model, params = tracker_and_params
    backbone = ssm_vit.MaskedSequenceDecoder(config=TINY)
    bb_params = params["backbone"]
    # One track with hints at t=0 and t=1.
    qp = jnp.asarray([[[[0.0, 8.0, 8.0], [1.0, 10.0, 10.0]]]])
    padding = jnp.ones((1, 1, 2))
    tokens = backbone.apply(
        {"params": bb_params},
        T,
        qp,
        padding,
        method=ssm_vit.MaskedSequenceDecoder.embed_queries_and_hints,
    )
    mask_tok = np.asarray(bb_params["mask_token"])[0, 0, 0]
    assert not np.allclose(tokens[0, 0, 0], mask_tok)  # hint 0
    assert not np.allclose(tokens[0, 1, 0], mask_tok)  # hint 1
    np.testing.assert_allclose(tokens[0, 2, 0], mask_tok)


class TestTAPNextForward:

  def test_offline_shapes(self, tracker_and_params):
    model, params = tracker_and_params
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(B, T, 32, 32, 3).astype(np.float32) * 2 - 1)
    qp = jnp.asarray(
        np.stack(
            [
                rng.randint(0, T, (B, Q)).astype(np.float32),
                rng.rand(B, Q) * 32,
                rng.rand(B, Q) * 32,
            ],
            axis=-1,
        )
    )
    out = model.apply({"params": params}, video, qp)
    assert out.tracks.shape == (B, Q, T, 2)
    assert out.track_logits.shape == (B, Q, T, 512)
    assert out.visible_logits.shape == (B, Q, T, 1)
    assert len(out.intermediate_tracks) == TINY.depth
    # Decoded coordinates live in the 256-bin raster range.
    assert float(out.tracks.min()) >= 0.0
    assert float(out.tracks.max()) <= 256.0

  def test_streaming_matches_offline(self, tracker_and_params):
    model, params = tracker_and_params
    rng = np.random.RandomState(1)
    video = jnp.asarray(rng.rand(B, T, 32, 32, 3).astype(np.float32) * 2 - 1)
    qp = jnp.asarray([[[0.0, 8.0, 8.0], [0.0, 16.0, 16.0], [2.0, 20.0, 4.0]]])

    offline = model.apply({"params": params}, video, qp)

    # Warm-up on frame 0 with the queries, then stream the rest.
    res = model.apply(
        {"params": params},
        video[:, :1],
        qp,
        method=tapnext.TAPNextTracker.forward_step,
    )
    tracks = [np.asarray(res.tracks)]
    vis = [np.asarray(res.visible_logits)]
    state = res.state
    for t in range(1, T):
      res = model.apply(
          {"params": params},
          video[:, t : t + 1],
          None,
          None,
          state,
          method=tapnext.TAPNextTracker.forward_step,
      )
      state = res.state
      tracks.append(np.asarray(res.tracks))
      vis.append(np.asarray(res.visible_logits))

    online_tracks = np.concatenate(tracks, axis=2)
    online_vis = np.concatenate(vis, axis=2)
    np.testing.assert_allclose(
        online_tracks, np.asarray(offline.tracks), rtol=1e-4, atol=2e-3
    )
    np.testing.assert_allclose(
        online_vis, np.asarray(offline.visible_logits), rtol=1e-4, atol=2e-3
    )

  def test_certainty_range(self, tracker_and_params):
    model, params = tracker_and_params
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 4, 512).astype(np.float32))
    tracks = jnp.asarray(rng.rand(2, 4, 2).astype(np.float32) * 256)
    cert = tapnext.tracker_certainty(tracks, logits)
    assert cert.shape == (2, 4, 1)
    assert float(cert.min()) >= 0.0
    assert float(cert.max()) <= 1.0


class TestPosembAdaptation:
  """Resolution adaptation of learned posembs
  (reference tapnext_torch.py:248-284)."""

  def _tiny(self, image_size):
    from tapnet_tpu.models import ssm_vit
    return ssm_vit.variant_config("mu", image_size=image_size)

  def test_identity_at_native_resolution(self):
    from tapnet_tpu.checkpoints import tapnext_checkpoint
    from tapnet_tpu.models import tapnext

    cfg = self._tiny((32, 32))
    model = tapnext.TAPNextTracker(config=cfg)
    video = jnp.zeros((1, 2, 32, 32, 3))
    queries = jnp.zeros((1, 2, 3))
    params = model.init(jax.random.PRNGKey(0), video, queries)["params"]
    adapted = tapnext_checkpoint.adapt_posembs(params, cfg, cfg)
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(adapted),
    ):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_upscaled_model_runs(self):
    from tapnet_tpu.checkpoints import tapnext_checkpoint
    from tapnet_tpu.models import tapnext

    cfg_small = self._tiny((32, 32))
    cfg_big = self._tiny((64, 64))
    model_small = tapnext.TAPNextTracker(config=cfg_small)
    video = jnp.zeros((1, 2, 32, 32, 3))
    queries = jnp.array([[[0.0, 8.0, 8.0], [1.0, 20.0, 4.0]]])
    params = model_small.init(jax.random.PRNGKey(0), video, queries)[
        "params"
    ]
    adapted = tapnext_checkpoint.adapt_posembs(params, cfg_small, cfg_big)

    model_big = tapnext.TAPNextTracker(config=cfg_big)
    video_big = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 2, 64, 64, 3)
    )
    out = model_big.apply(
        {"params": adapted}, video_big, queries * 2.0
    )
    assert out.tracks.shape == (1, 2, 2, 2)
    assert bool(jnp.isfinite(out.tracks).all())

  def test_bicubic_preserves_linear_ramp(self):
    from tapnet_tpu.checkpoints import tapnext_checkpoint

    # A linear ramp along y must stay (nearly) linear after resizing.
    h = 8
    ramp = np.broadcast_to(
        np.linspace(0, 1, h)[:, None, None], (h, h, 4)
    ).reshape(1, h * h, 4).astype(np.float32)
    out = tapnext_checkpoint._resize_posemb(ramp, (16, 16), "pe")
    grid = out.reshape(16, 16, 4)
    col = grid[:, 0, 0]
    diffs = np.diff(col[2:-2])
    assert np.all(diffs > 0)
    # Bicubic interpolation overshoots near sample points, so interior
    # spacing is only approximately uniform (torch bicubic shows the same
    # ~0.22 relative deviation). The exact-match property vs torch is
    # covered by test_tapnext_torch_parity; here just bound the deviation.
    np.testing.assert_allclose(
        diffs, diffs.mean(), rtol=0.3
    )


class TestTokenSubsampling:
  """Temporal-suffix token masking (reference ssm_utils.py:67-142)."""

  def _run(self, is_training=True, override=None, seed=0):
    from tapnet_tpu.models import ssm_vit

    b, t, n, d = 3, 8, 5, 4
    tokens = jnp.arange(b * t * n * d, dtype=jnp.float32).reshape(
        b, t, n, d
    )
    mask_token = jnp.full((1, 1, 1, d), -1.0)
    mod = ssm_vit.TokenSubsampling(
        drop_ratio=0.5, is_training=is_training
    )
    return mod.apply(
        {},
        tokens,
        mask_token,
        override,
        rngs={"degradation": jax.random.PRNGKey(seed)},
    ), tokens

  def test_suffix_is_masked(self):
    (out, masked), tokens = self._run()
    out, masked = np.asarray(out), np.asarray(masked)
    for b in range(out.shape[0]):
      s = masked[b].argmax()
      assert 1 <= s <= out.shape[1] - 1
      assert not masked[b, :s].any() and masked[b, s:].all()
      np.testing.assert_array_equal(out[b, s:], -1.0)
      np.testing.assert_array_equal(
          out[b, :s], np.asarray(tokens)[b, :s]
      )

  def test_eval_mode_is_identity(self):
    (out, masked), tokens = self._run(is_training=False)
    assert not np.asarray(masked).any()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tokens))

  def test_override_zero_disables(self):
    (out, masked), tokens = self._run(is_training=True, override=0.0)
    assert not np.asarray(masked).any()
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tokens))


class TestRemat:
  """Per-layer rematerialization (SsmVitConfig.remat) is numerics-neutral.

  The tapnextpp long-video preset trains with nn.remat(ViTSSMBlock)
  (configs.py::tapnextpp_experiment); the recompute path must produce the
  same forward values and the same (finite) gradients as the stored path.
  """

  def test_forward_and_grads_match_no_remat(self, tracker_and_params):
    import dataclasses

    model, params = tracker_and_params
    rmodel = tapnext.TAPNextTracker(
        config=dataclasses.replace(TINY, remat=True)
    )
    rng = np.random.RandomState(3)
    video = jnp.asarray(rng.rand(B, T, 32, 32, 3).astype(np.float32) * 2 - 1)
    qp = jnp.asarray([[[0.0, 8.0, 8.0], [0.0, 16.0, 16.0], [2.0, 20.0, 4.0]]])

    out = model.apply({"params": params}, video, qp)
    rout = rmodel.apply({"params": params}, video, qp)
    np.testing.assert_allclose(
        np.asarray(rout.tracks), np.asarray(out.tracks), rtol=1e-5, atol=1e-5
    )

    def loss(m):
      def f(p):
        o = m.apply({"params": p}, video, qp)
        return jnp.mean(o.track_logits**2) + jnp.mean(o.visible_logits**2)

      return f

    g = jax.grad(loss(model))(params)
    rg = jax.grad(loss(rmodel))(params)
    flat, rflat = jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(rg)
    assert all(np.isfinite(np.asarray(x)).all() for x in rflat)
    for a, b in zip(flat, rflat):
      np.testing.assert_allclose(
          np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5
      )
