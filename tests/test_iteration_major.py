"""Iteration-major refinement: equivalence with chunk-major, and the
memory-safety gate (ADVICE r1: iteration-major must not run the einsum
correlation fallback over all queries at once)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.models import tapir as tapir_lib
from tapnet_tpu.ops import corr_tents

B, T, H, W, N = 1, 4, 32, 40, 6

CFG_KWARGS = dict(
    num_mixer_blocks=2,
    pyramid_level=1,
    num_pips_iter=2,
    initial_resolution=(H, W),
    blocks_per_group=(1, 1, 1, 1),
)


def make_inputs():
  rng = np.random.RandomState(3)
  video = jnp.asarray(rng.rand(B, T, H, W, 3).astype(np.float32) * 2 - 1)
  qp = np.stack(
      [
          rng.randint(0, T, (B, N)).astype(np.float32),
          rng.rand(B, N) * H,
          rng.rand(B, N) * W,
      ],
      axis=-1,
  )
  return video, jnp.asarray(qp)


def make_model(**overrides):
  cfg = tapir_lib.TapirConfig(**{**CFG_KWARGS, **overrides})
  return tapir_lib.TAPIR(config=cfg)


@pytest.fixture
def interpret_kernels():
  corr_tents.FORCE_INTERPRET = True
  yield
  corr_tents.FORCE_INTERPRET = False


def test_matches_chunk_major(interpret_kernels):
  video, qp = make_inputs()
  base = make_model()
  params = base.init(jax.random.PRNGKey(0), video, qp, query_chunk_size=N)[
      "params"
  ]
  chunk_major = base.apply({"params": params}, video, qp, query_chunk_size=2)

  itmajor_model = make_model(iteration_major_refinement=True)
  # FORCE_INTERPRET makes the fused-corr gate pass on CPU.
  it_major = itmajor_model.apply(
      {"params": params}, video, qp, query_chunk_size=2
  )
  np.testing.assert_allclose(
      chunk_major["tracks"], it_major["tracks"], atol=1e-4, rtol=1e-5
  )
  np.testing.assert_allclose(
      chunk_major["occlusion"], it_major["occlusion"], atol=1e-4, rtol=1e-5
  )
  np.testing.assert_allclose(
      chunk_major["expected_dist"],
      it_major["expected_dist"],
      atol=1e-4,
      rtol=1e-5,
  )


@pytest.mark.parametrize(
    "overrides",
    [
        dict(use_fused_corr=False),
        dict(use_gather_tents=True),
        dict(use_matmul_corr=False),
    ],
)
def test_gate_rejects_unfused_corr(monkeypatch, overrides):
  """When the fused corr kernel cannot engage, iteration-major must fall back
  to the chunk-major scan (otherwise the einsum fallback materializes the
  full [B, N_total, T, H, W] correlation volume)."""
  video, qp = make_inputs()
  model = make_model(iteration_major_refinement=True, **overrides)
  params = model.init(jax.random.PRNGKey(0), video, qp, query_chunk_size=N)[
      "params"
  ]

  def boom(*args, **kwargs):
    raise AssertionError("iteration-major ran without the fused corr kernel")

  monkeypatch.setattr(tapir_lib.TAPIR, "_estimate_iteration_major", boom)
  out = model.apply({"params": params}, video, qp, query_chunk_size=2)
  assert np.isfinite(np.asarray(out["tracks"])).all()


def test_gate_rejects_oversized_frames(monkeypatch):
  """Frames beyond the kernel's VMEM budget fall back to chunk-major."""
  video, qp = make_inputs()
  model = make_model(iteration_major_refinement=True)
  params = model.init(jax.random.PRNGKey(0), video, qp, query_chunk_size=N)[
      "params"
  ]

  def boom(*args, **kwargs):
    raise AssertionError("iteration-major ran with oversized frame grids")

  monkeypatch.setattr(tapir_lib.TAPIR, "_estimate_iteration_major", boom)
  monkeypatch.setattr(corr_tents, "_MAX_FRAME_BYTES", 0)
  out = model.apply({"params": params}, video, qp, query_chunk_size=2)
  assert np.isfinite(np.asarray(out["tracks"])).all()


def test_gate_rejects_cpu_backend(monkeypatch):
  """Without FORCE_INTERPRET on a CPU backend, the gate must reject."""
  video, qp = make_inputs()
  model = make_model(iteration_major_refinement=True)
  params = model.init(jax.random.PRNGKey(0), video, qp, query_chunk_size=N)[
      "params"
  ]

  def boom(*args, **kwargs):
    raise AssertionError("iteration-major ran on a non-TPU backend")

  monkeypatch.setattr(tapir_lib.TAPIR, "_estimate_iteration_major", boom)
  assert not corr_tents.FORCE_INTERPRET
  out = model.apply({"params": params}, video, qp, query_chunk_size=2)
  assert np.isfinite(np.asarray(out["tracks"])).all()
