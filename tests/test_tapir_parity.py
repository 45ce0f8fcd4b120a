"""TAPIR numerical parity against the reference implementation.

Strategy (SURVEY.md §4): initialize the reference Haiku model with random
weights, import them through our checkpoint converter, and require the two
implementations to agree at fp32. This exercises the whole model graph —
backbone, cost volume, soft-argmax, pyramid correlation, mixer — plus the
converter itself, which is exactly the path a released checkpoint takes.
"""

import functools

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

pytestmark = pytest.mark.skipif(
    not HAS_REF, reason="reference oracle not importable"
)

B, T, H, W, N = 1, 4, 32, 40, 4

SMALL_KWARGS = dict(
    num_mixer_blocks=2,
    pyramid_level=1,
    num_pips_iter=2,
    softmax_temperature=20.0,
    initial_resolution=(H, W),
    blocks_per_group=(1, 1, 1, 1),
)


def small_config(**overrides):
  cfg = dict(
      num_mixer_blocks=2,
      pyramid_level=1,
      num_pips_iter=2,
      softmax_temperature=20.0,
      initial_resolution=(H, W),
      blocks_per_group=(1, 1, 1, 1),
  )
  cfg.update(overrides)
  return cfg


@functools.lru_cache(maxsize=4)
def make_pair(use_causal_conv=False, extra_convs=False):
  """Returns (ref_params, ref_forward, our_params, our_model)."""

  def fwd(video, qp):
    model = ref_tapir.TAPIR(
        use_causal_conv=use_causal_conv,
        extra_convs=extra_convs,
        **small_config(),
    )
    return model(
        video, is_training=False, query_points=qp, query_chunk_size=N
    )

  transformed = hk.transform_with_state(fwd)
  video = make_video()
  qp = make_queries()
  ref_params, ref_state = transformed.init(jax.random.PRNGKey(0), video, qp)
  assert not ref_state

  def ref_forward(video, qp, chunk=N):
    def fwd2(video, qp):
      model = ref_tapir.TAPIR(
          use_causal_conv=use_causal_conv,
          extra_convs=extra_convs,
          **small_config(),
      )
      return model(
          video, is_training=False, query_points=qp, query_chunk_size=chunk
      )

    t2 = hk.transform_with_state(fwd2)
    out, _ = t2.apply(ref_params, {}, jax.random.PRNGKey(42), video, qp)
    return out

  our_model = tapir_lib.TAPIR(
      config=tapir_lib.TapirConfig(
          num_mixer_blocks=2,
          pyramid_level=1,
          num_pips_iter=2,
          initial_resolution=(H, W),
          blocks_per_group=(1, 1, 1, 1),
          use_causal_conv=use_causal_conv,
          extra_convs=extra_convs,
      )
  )
  our_params = convert_haiku_tapir_params(
      jax.tree_util.tree_map(np.asarray, dict(ref_params))
  )
  return ref_forward, our_params, our_model


def make_video():
  rng = np.random.RandomState(7)
  return jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1)


def make_queries():
  rng = np.random.RandomState(8)
  qp = np.stack(
      [
          rng.randint(0, T, (B, N)).astype(np.float32),
          rng.rand(B, N) * H,
          rng.rand(B, N) * W,
      ],
      axis=-1,
  )
  return jnp.asarray(qp)


def assert_outputs_close(ref_out, our_out, atol=5e-3):
  np.testing.assert_allclose(
      ref_out["tracks"], our_out["tracks"], atol=atol, rtol=1e-4
  )
  np.testing.assert_allclose(
      ref_out["occlusion"], our_out["occlusion"], atol=atol, rtol=1e-4
  )
  np.testing.assert_allclose(
      ref_out["expected_dist"], our_out["expected_dist"], atol=atol, rtol=1e-4
  )


class TestOfflineParity:

  def test_forward_matches_reference(self):
    ref_forward, our_params, our_model = make_pair()
    video, qp = make_video(), make_queries()
    ref_out = ref_forward(video, qp)
    our_out = our_model.apply({"params": our_params}, video, qp)
    assert_outputs_close(ref_out, our_out)

  def test_unrefined_iterations_match(self):
    ref_forward, our_params, our_model = make_pair()
    video, qp = make_video(), make_queries()
    ref_out = ref_forward(video, qp)
    our_out = our_model.apply({"params": our_params}, video, qp)
    assert len(ref_out["unrefined_tracks"]) == len(our_out["unrefined_tracks"])
    for r, o in zip(ref_out["unrefined_tracks"], our_out["unrefined_tracks"]):
      np.testing.assert_allclose(r, o, atol=5e-3, rtol=1e-4)

  def test_query_chunking_invariant(self):
    _, our_params, our_model = make_pair()
    video, qp = make_video(), make_queries()
    full = our_model.apply({"params": our_params}, video, qp)
    chunked = our_model.apply(
        {"params": our_params}, video, qp, query_chunk_size=2
    )
    np.testing.assert_allclose(
        full["tracks"], chunked["tracks"], atol=1e-4, rtol=1e-5
    )

  def test_gather_path_matches_matmul_path(self):
    ref_forward, our_params, our_model = make_pair()
    video, qp = make_video(), make_queries()
    matmul_out = our_model.apply({"params": our_params}, video, qp)
    gather_model = tapir_lib.TAPIR(
        config=tapir_lib.TapirConfig(
            num_mixer_blocks=2,
            pyramid_level=1,
            num_pips_iter=2,
            initial_resolution=(H, W),
            blocks_per_group=(1, 1, 1, 1),
            use_matmul_corr=False,
        )
    )
    gather_out = gather_model.apply({"params": our_params}, video, qp)
    np.testing.assert_allclose(
        matmul_out["tracks"], gather_out["tracks"], atol=1e-3, rtol=1e-4
    )

  @pytest.mark.slow
  def test_single_resolution_refinement_matches_reference(self):
    """The fast inference config (refinement at the final resolution only —
    the 1.26 s @480p knob, PERFORMANCE.md) maps onto the reference's own
    `refinement_resolutions` argument (tapir_model.py:630-651), so its
    accuracy delta vs the default pyramid is exactly the reference's: the
    two implementations must stay bit-comparable with the knob engaged."""
    _, our_params, our_model = make_pair()
    # A video above initial_resolution so the default schedule is genuinely
    # multi-resolution and the knob collapses it to the final size only.
    rng = np.random.RandomState(11)
    video = jnp.asarray(
        rng.rand(B, T, 2 * H, 2 * W, 3).astype(np.float32) * 2 - 1
    )
    qp = make_queries() * jnp.asarray([1.0, 2.0, 2.0])
    rr = [(2 * H, 2 * W)]

    def fwd(video, qp):
      model = ref_tapir.TAPIR(**small_config())
      return model(
          video,
          is_training=False,
          query_points=qp,
          query_chunk_size=N,
          refinement_resolutions=rr,
      )

    transformed = hk.transform_with_state(fwd)
    ref_params, _ = transformed.init(jax.random.PRNGKey(0), video, qp)
    our_params_rr = convert_haiku_tapir_params(
        jax.tree_util.tree_map(np.asarray, dict(ref_params))
    )
    ref_out, _ = transformed.apply(
        ref_params, {}, jax.random.PRNGKey(42), video, qp
    )
    our_out = our_model.apply(
        {"params": our_params_rr}, video, qp, refinement_resolutions=rr
    )
    assert_outputs_close(ref_out, our_out)
    # And the knob genuinely changes the schedule vs the default pyramid.
    default_out = our_model.apply({"params": our_params_rr}, video, qp)
    assert len(our_out["unrefined_tracks"]) < len(
        default_out["unrefined_tracks"]
    )

  def test_extra_convs_parity(self):
    ref_forward, our_params, our_model = make_pair(extra_convs=True)
    video, qp = make_video(), make_queries()
    ref_out = ref_forward(video, qp)
    our_out = our_model.apply({"params": our_params}, video, qp)
    assert_outputs_close(ref_out, our_out)


class TestCausalParity:

  def test_causal_offline_matches_reference(self):
    ref_forward, our_params, our_model = make_pair(use_causal_conv=True)
    video, qp = make_video(), make_queries()
    ref_out = ref_forward(video, qp)
    our_out = our_model.apply({"params": our_params}, video, qp)
    assert_outputs_close(ref_out, our_out)

  def test_streaming_matches_offline(self):
    """Frame-by-frame rollout with typed causal state == offline causal."""
    _, our_params, our_model = make_pair(use_causal_conv=True)
    video, qp = make_video(), make_queries()

    # Online: query features from the full video once, then stream frames.
    feature_grids = our_model.apply(
        {"params": our_params},
        video,
        method=tapir_lib.TAPIR.get_feature_grids,
    )
    query_features = our_model.apply(
        {"params": our_params},
        video.shape,
        qp,
        feature_grids,
        method=tapir_lib.TAPIR.get_query_features,
    )

    # Offline rollout WITHOUT the verbatim query-point constraint: with the
    # constraint, the query frame's (replaced) position feeds the causal
    # mixer and changes all later frames, which streaming (no constraint)
    # can't reproduce.
    offline_traj = our_model.apply(
        {"params": our_params},
        (H, W),
        feature_grids,
        query_features,
        None,
        method=tapir_lib.TAPIR.estimate_trajectories,
    )
    p_iter = our_model.config.num_pips_iter
    offline = dict(
        tracks=jnp.mean(
            jnp.stack(offline_traj["tracks"][p_iter::p_iter]), axis=0
        ),
        occlusion=jnp.mean(
            jnp.stack(offline_traj["occlusion"][p_iter::p_iter]), axis=0
        ),
    )
    state = our_model.apply(
        {"params": our_params},
        B,
        N,
        1,
        method=tapir_lib.TAPIR.construct_initial_causal_state,
    )

    tracks, occs = [], []
    for t in range(T):
      frame_grids = our_model.apply(
          {"params": our_params},
          video[:, t : t + 1],
          method=tapir_lib.TAPIR.get_feature_grids,
      )
      out = our_model.apply(
          {"params": our_params},
          (H, W),
          frame_grids,
          query_features,
          None,
          None,
          state,
          True,
          method=tapir_lib.TAPIR.estimate_trajectories,
      )
      state = out["causal_context"]
      p = our_model.config.num_pips_iter
      tracks.append(
          jnp.mean(jnp.stack(out["tracks"][p::p]), axis=0)
      )
      occs.append(jnp.mean(jnp.stack(out["occlusion"][p::p]), axis=0))

    online_tracks = jnp.concatenate(tracks, axis=2)
    online_occ = jnp.concatenate(occs, axis=2)

    np.testing.assert_allclose(
        np.asarray(offline["tracks"]),
        np.asarray(online_tracks),
        atol=1e-2,
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(offline["occlusion"]),
        np.asarray(online_occ),
        atol=1e-2,
        rtol=1e-4,
    )


class TestGatherTents:
  """Gather-based tent extraction must equal the matmul form exactly."""

  def test_matches_matmul_tents(self):
    import dataclasses
    from tapnet_tpu.models import tapir as tapir_lib

    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, 4, 64, 64, 3).astype(np.float32) * 2 - 1)
    queries = jnp.asarray(
        np.stack([
            rng.randint(0, 4, 6).astype(np.float32),
            rng.rand(6) * 64,
            rng.rand(6) * 64,
        ], -1)[None]
    )
    cfg = tapir_lib.tapir_config()
    model = tapir_lib.TAPIR(config=cfg)
    params = model.init(jax.random.PRNGKey(0), video, queries)["params"]
    out_a = model.apply({"params": params}, video, queries)

    cfg_g = dataclasses.replace(cfg, use_gather_tents=True)
    out_b = tapir_lib.TAPIR(config=cfg_g).apply(
        {"params": params}, video, queries
    )
    np.testing.assert_allclose(
        np.asarray(out_a["tracks"]),
        np.asarray(out_b["tracks"]),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_a["occlusion"]),
        np.asarray(out_b["occlusion"]),
        rtol=1e-4,
        atol=1e-4,
    )

  def test_boundary_patches_match(self):
    """Queries at the image edge exercise the zero-weight boundary."""
    import dataclasses
    from tapnet_tpu.models import tapir as tapir_lib

    rng = np.random.RandomState(1)
    video = jnp.asarray(rng.rand(1, 3, 64, 64, 3).astype(np.float32) * 2 - 1)
    queries = jnp.asarray(
        [[[0.0, 0.5, 0.5], [1.0, 63.5, 63.5], [2.0, 0.5, 63.5]]]
    )
    cfg = tapir_lib.tapir_config()
    model = tapir_lib.TAPIR(config=cfg)
    params = model.init(jax.random.PRNGKey(0), video, queries)["params"]
    out_a = model.apply({"params": params}, video, queries)
    cfg_g = dataclasses.replace(cfg, use_gather_tents=True)
    out_b = tapir_lib.TAPIR(config=cfg_g).apply(
        {"params": params}, video, queries
    )
    np.testing.assert_allclose(
        np.asarray(out_a["tracks"]),
        np.asarray(out_b["tracks"]),
        rtol=1e-4,
        atol=1e-4,
    )
