"""TAPNext full-model parity vs the reference torch oracle.

Random Flax weights -> released-format npz -> the reference converter
(/root/reference/tapnet/tapnext/tapnext_torch_utils.py:60-204) -> the
reference torch TAPNext (/root/reference/tapnet/tapnext/tapnext_torch.py:85).
Compares the offline forward AND the per-frame forward_step streaming
rollout at fp32. This exercises every production component end-to-end:
patch embedding, posembs, query embedding, 12 TRecViT blocks (RG-LRU SSM +
ViT attention), encoder norm, coordinate/visible heads, and the truncated
soft-argmax decode.

The converter hardcodes width=768/depth=12 (ViT-B), so the test runs the
production width at a small image size (64x64 -> 8x8 patch grid) and short
clip to keep CPU time bounded.

torchvision is not installed here; tests/_torchvision_stub.py provides a
faithful EncoderBlock (see its docstring).
"""

import numpy as np
import pytest

import _torchvision_stub

_torchvision_stub.install_stub()

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tapnet.tapnext import tapnext_torch
from tapnet.tapnext import tapnext_torch_utils

from tapnet_tpu.checkpoints import tapnext_checkpoint
from tapnet_tpu.models import ssm_vit, tapnext

IMAGE_SIZE = 64
FRAMES = 3
QUERIES = 4


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
  """(flax_model, flax_params, torch_model) with identical weights."""
  # posemb_full="sincos2d": the torch oracle hardcodes the fixed sincos
  # buffer for query positional embeddings (tapnext_torch.py:139-142, a
  # registered buffer, never restored from checkpoints) — so released
  # TAPNext checkpoints use the sincos variant, not the learned default.
  config = ssm_vit.SsmVitConfig(
      image_size=(IMAGE_SIZE, IMAGE_SIZE), posemb_full="sincos2d"
  )
  model = tapnext.TAPNextTracker(config=config)
  video = jnp.zeros((1, 2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)
  qp = jnp.zeros((1, 2, 3), jnp.float32)
  params = model.init(jax.random.PRNGKey(0), video, qp)["params"]

  path = str(tmp_path_factory.mktemp("ckpt") / "tapnext.npz")
  tapnext_checkpoint.save_tapnext_checkpoint(path, params)

  tmodel = tapnext_torch.TAPNext(image_size=(IMAGE_SIZE, IMAGE_SIZE))
  tapnext_torch_utils.restore_model_from_jax_checkpoint(tmodel, path)
  tmodel.eval()
  return model, params, tmodel


def make_inputs(seed=0):
  rng = np.random.RandomState(seed)
  video = rng.rand(1, FRAMES, IMAGE_SIZE, IMAGE_SIZE, 3).astype(
      np.float32
  ) * 2 - 1
  # Query timesteps cover t=0 and later frames; positions strictly interior
  # (the torch port clamps at borders where our sampler uses the same
  # nearest-boundary rule, but interior points avoid any edge convention).
  qp = np.stack(
      [
          np.array([0.0, 0.0, 1.0, 2.0]),
          rng.rand(QUERIES) * (IMAGE_SIZE - 16) + 8,
          rng.rand(QUERIES) * (IMAGE_SIZE - 16) + 8,
      ],
      axis=-1,
  ).astype(np.float32)[None]
  return video, qp


class TestOfflineParity:

  def test_forward_matches_torch(self, pair):
    model, params, tmodel = pair
    video, qp = make_inputs()

    res = model.apply({"params": params}, jnp.asarray(video),
                      jnp.asarray(qp))
    with torch.no_grad():
      t_tracks, t_logits, t_vis, _ = tmodel(
          torch.from_numpy(video), torch.from_numpy(qp)
      )

    # Ours: [B, Q, T, ...] -> [B, T, Q, ...] (torch layout).
    ours_tracks = np.asarray(res.tracks).transpose(0, 2, 1, 3)
    ours_logits = np.asarray(res.track_logits).transpose(0, 2, 1, 3)
    ours_vis = np.asarray(res.visible_logits).transpose(0, 2, 1, 3)

    # fp32 accumulation drift over 12 width-768 blocks between XLA:CPU and
    # torch op orders measures ~1e-3 max on O(0.5)-scale logits.
    np.testing.assert_allclose(
        ours_logits, t_logits.numpy(), rtol=1e-3, atol=3e-3
    )
    np.testing.assert_allclose(
        ours_vis, t_vis.numpy(), rtol=1e-3, atol=3e-3
    )
    np.testing.assert_allclose(
        ours_tracks, t_tracks.numpy(), rtol=1e-3, atol=1e-2
    )


class TestStreamingParity:

  def test_forward_step_matches_torch_stream(self, pair):
    model, params, tmodel = pair
    video, qp = make_inputs(seed=1)

    # Ours: warm-up on frame 0 with the queries, then stream.
    ours_tracks, ours_vis = [], []
    res = model.apply(
        {"params": params},
        jnp.asarray(video[:, :1]),
        jnp.asarray(qp),
        method=tapnext.TAPNextTracker.forward_step,
    )
    ours_tracks.append(np.asarray(res.tracks)[:, :, 0])
    ours_vis.append(np.asarray(res.visible_logits)[:, :, 0])
    for i in range(1, FRAMES):
      res = model.apply(
          {"params": params},
          jnp.asarray(video[:, i : i + 1]),
          None,
          None,
          res.state,
          method=tapnext.TAPNextTracker.forward_step,
      )
      ours_tracks.append(np.asarray(res.tracks)[:, :, 0])
      ours_vis.append(np.asarray(res.visible_logits)[:, :, 0])

    # Torch: per-frame rollout with TAPNextTrackingState.
    t_tracks, t_vis = [], []
    state = None
    with torch.no_grad():
      tr, _, vi, state = tmodel(
          torch.from_numpy(video[:, :1]), torch.from_numpy(qp)
      )
      t_tracks.append(tr.numpy()[:, 0])
      t_vis.append(vi.numpy()[:, 0])
      for i in range(1, FRAMES):
        tr, _, vi, state = tmodel(
            torch.from_numpy(video[:, i : i + 1]), None, state
        )
        t_tracks.append(tr.numpy()[:, 0])
        t_vis.append(vi.numpy()[:, 0])

    for i in range(FRAMES):
      np.testing.assert_allclose(
          ours_vis[i], t_vis[i], rtol=1e-3, atol=3e-3,
          err_msg=f"visible logits, frame {i}",
      )
      np.testing.assert_allclose(
          ours_tracks[i], t_tracks[i], rtol=1e-3, atol=1e-2,
          err_msg=f"tracks, frame {i}",
      )


class TestPosembInterpolationParity:
  """The 512-input adaptation path: our bicubic posemb resize must match
  the torch oracle's F.interpolate(mode='bicubic', align_corners=False)
  (/root/reference/tapnet/tapnext/tapnext_torch.py:248-284)."""

  def test_resize_matches_torch_bicubic_upscale(self):
    rng = np.random.RandomState(0)
    pe = rng.randn(1, 64, 16).astype(np.float32)  # 8x8 native grid

    ours = tapnext_checkpoint._resize_posemb(pe, (16, 16), "pos_embedding")

    t = torch.from_numpy(pe.reshape(8, 8, 16)).permute(2, 0, 1)[None]
    ref = torch.nn.functional.interpolate(
        t, size=(16, 16), mode="bicubic", align_corners=False
    )[0].permute(1, 2, 0).numpy().reshape(1, 256, 16)

    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

  def test_resize_identity_at_native(self):
    rng = np.random.RandomState(1)
    pe = rng.randn(1, 64, 8).astype(np.float32)
    out = tapnext_checkpoint._resize_posemb(pe, (8, 8), "pos_embedding")
    np.testing.assert_array_equal(out, pe)


class TestTorchStateDictImport:
  """torch .pt -> Flax params (tapnext_torch_import): TAPNext++ weights are
  released only as torch state dicts (reference tapnextpp/README.md)."""

  def test_state_dict_round_trip(self, pair):
    from tapnet_tpu.checkpoints import tapnext_torch_import

    model, params, tmodel = pair
    flat_orig = tapnext_checkpoint.flatten(
        jax.tree_util.tree_map(np.asarray, params)
    )
    flat_imported = tapnext_torch_import.state_dict_to_flat_jax(
        tmodel.state_dict(), num_heads=12
    )
    assert set(flat_imported) == set(flat_orig)
    for k in sorted(flat_orig):
      np.testing.assert_allclose(
          flat_imported[k], flat_orig[k], rtol=1e-6, atol=1e-6, err_msg=k
      )

  def test_load_pt_file(self, pair, tmp_path):
    from tapnet_tpu.checkpoints import tapnext_torch_import

    model, params, tmodel = pair
    path = str(tmp_path / "tapnext.pt")
    # Released checkpoints commonly wrap the state dict.
    torch.save({"state_dict": tmodel.state_dict()}, path)
    imported = tapnext_torch_import.load_tapnext_torch_checkpoint(path)
    video, qp = make_inputs(seed=3)
    a = model.apply({"params": params}, jnp.asarray(video), jnp.asarray(qp))
    b = model.apply({"params": imported}, jnp.asarray(video),
                    jnp.asarray(qp))
    np.testing.assert_allclose(
        np.asarray(a.tracks), np.asarray(b.tracks), rtol=1e-5, atol=1e-5
    )


class TestStateDictExtraction:

  def test_strips_lightning_model_prefix(self):
    from tapnet_tpu.checkpoints import tapnext_torch_import

    sd = {"model.lin_proj.weight": 1, "model.blocks.0.x": 2}
    out = tapnext_torch_import._extract_state_dict({"state_dict": sd})
    assert set(out) == {"lin_proj.weight", "blocks.0.x"}

  def test_keeps_unprefixed_keys(self):
    from tapnet_tpu.checkpoints import tapnext_torch_import

    sd = {"lin_proj.weight": 1, "model_tail.x": 2}
    out = tapnext_torch_import._extract_state_dict(sd)
    assert set(out) == {"lin_proj.weight", "model_tail.x"}

  def test_weights_only_failure_message(self, tmp_path):
    from tapnet_tpu.checkpoints import tapnext_torch_import

    # Lightning .ckpt files carry non-tensor metadata that
    # torch.load(weights_only=True) rejects; the importer must say so.
    path = str(tmp_path / "lightning.ckpt")
    torch.save(
        {"state_dict": {"x": torch.zeros(1)},
         "hyper_parameters": np.random.RandomState(0)},
        path,
    )
    with pytest.raises(ValueError, match="allow_pickle=True"):
      tapnext_torch_import.load_tapnext_torch_checkpoint(path)
