"""Griffin/RG-LRU block parity vs the reference torch implementation
(tapnext_lru_modules.py), plus scan-mode self-consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tapnet_tpu.models import rglru

try:
  import torch
  from tapnet.tapnext import tapnext_lru_modules as ref_lru

  HAS_REF = True
except Exception:
  HAS_REF = False

needs_ref = pytest.mark.skipif(not HAS_REF, reason="torch oracle unavailable")

B, T, C = 2, 7, 32
HEADS = 4
MLP = 64


class TestLinearRecurrence:

  def test_matches_sequential_loop(self):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    a = jnp.asarray(rng.rand(B, T, C).astype(np.float32) * 0.2 + 0.7)
    h0 = jnp.asarray(rng.randn(B, C).astype(np.float32))

    y, h_last = rglru.linear_recurrence(x, a, h0)

    h = np.asarray(h0)
    ys = []
    for t in range(T):
      h = np.asarray(a[:, t]) * h + np.asarray(x[:, t])
      ys.append(h.copy())
    np.testing.assert_allclose(y, np.stack(ys, 1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(h_last, ys[-1], rtol=1e-5, atol=1e-5)

  def test_one_step(self):
    x = jnp.ones((1, 1, 4))
    a = jnp.full((1, 1, 4), 0.5)
    h0 = jnp.full((1, 4), 2.0)
    y, h = rglru.linear_recurrence(x, a, h0)
    np.testing.assert_allclose(y[:, 0], 2.0)
    np.testing.assert_allclose(h, 2.0)

  def test_sqrt_bound_derivative_clips(self):
    g = jax.grad(lambda x: rglru.sqrt_bound_derivative(x))(0.0)
    assert np.isfinite(g)
    assert g <= 1000.0 + 1e-6


def copy_flax_to_torch(flax_params, torch_block):
  """Copies our GriffinResidualBlock params into the torch oracle."""
  import torch

  p = flax_params

  def t(x):
    return torch.from_numpy(np.asarray(x))

  sd = {
      "temporal_pre_norm.scale": t(p["temporal_pre_norm"]["scale"]),
      "channel_pre_norm.scale": t(p["channel_pre_norm"]["scale"]),
      "recurrent_block.linear_y.weight": t(
          p["recurrent_block"]["linear_y"]["kernel"]
      ).T,
      "recurrent_block.linear_y.bias": t(
          p["recurrent_block"]["linear_y"]["bias"]
      ),
      "recurrent_block.linear_x.weight": t(
          p["recurrent_block"]["linear_x"]["kernel"]
      ).T,
      "recurrent_block.linear_x.bias": t(
          p["recurrent_block"]["linear_x"]["bias"]
      ),
      "recurrent_block.linear_out.weight": t(
          p["recurrent_block"]["linear_out"]["kernel"]
      ).T,
      "recurrent_block.linear_out.bias": t(
          p["recurrent_block"]["linear_out"]["bias"]
      ),
      "recurrent_block.conv_1d.w": t(p["recurrent_block"]["conv_1d"]["w"]),
      "recurrent_block.conv_1d.b": t(p["recurrent_block"]["conv_1d"]["b"]),
      "recurrent_block.rg_lru.a_param": t(
          p["recurrent_block"]["rg_lru"]["a_param"]
      ),
      "recurrent_block.rg_lru.input_gate.w": t(
          p["recurrent_block"]["rg_lru"]["input_gate"]["w"]
      ),
      "recurrent_block.rg_lru.input_gate.b": t(
          p["recurrent_block"]["rg_lru"]["input_gate"]["b"]
      ),
      "recurrent_block.rg_lru.a_gate.w": t(
          p["recurrent_block"]["rg_lru"]["a_gate"]["w"]
      ),
      "recurrent_block.rg_lru.a_gate.b": t(
          p["recurrent_block"]["rg_lru"]["a_gate"]["b"]
      ),
      "mlp_block.ffw_up.w": t(p["mlp_block"]["ffw_up"]["w"]),
      "mlp_block.ffw_up.b": t(p["mlp_block"]["ffw_up"]["b"]),
      "mlp_block.ffw_down.weight": t(
          p["mlp_block"]["ffw_down"]["kernel"]
      ).T,
      "mlp_block.ffw_down.bias": t(p["mlp_block"]["ffw_down"]["bias"]),
  }
  torch_block.load_state_dict(sd)


@pytest.fixture(scope="module")
def block_pair():
  block = rglru.GriffinResidualBlock(
      mlp_expanded_width=MLP, num_heads=HEADS
  )
  x = jnp.zeros((B, T, C))
  params = block.init(jax.random.PRNGKey(0), x)["params"]
  torch_block = ref_lru.ResidualBlock(
      width=C, mlp_expanded_width=MLP, num_heads=HEADS
  )
  copy_flax_to_torch(params, torch_block)
  torch_block.eval()
  return block, params, torch_block


@needs_ref
class TestGriffinParity:

  def test_full_sequence_matches_torch(self, block_pair):
    block, params, torch_block = block_pair
    rng = np.random.RandomState(1)
    x = rng.randn(B, T, C).astype(np.float32)

    ours, our_cache = block.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
      ref, ref_cache = torch_block(torch.from_numpy(x))

    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(our_cache.rg_lru_state),
        ref_cache.rg_lru_state.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(our_cache.conv1d_state),
        ref_cache.conv1d_state.numpy(),
        rtol=1e-4,
        atol=1e-5,
    )

  def test_streaming_matches_torch(self, block_pair):
    block, params, torch_block = block_pair
    rng = np.random.RandomState(2)
    x = rng.randn(B, T, C).astype(np.float32)

    our_cache = rglru.RecurrentBlock.init_cache(B, C)
    ref_cache = ref_lru.RecurrentBlock.init_cache(
        batch_size=B, lru_width=C, dtype=torch.float32
    )
    for t in range(T):
      ours, our_cache = block.apply(
          {"params": params}, jnp.asarray(x[:, t : t + 1]), our_cache
      )
      with torch.no_grad():
        ref, ref_cache = torch_block(
            torch.from_numpy(x[:, t : t + 1]), ref_cache
        )
      np.testing.assert_allclose(
          np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-5
      )

  def test_streaming_matches_offline(self, block_pair):
    block, params, _ = block_pair
    rng = np.random.RandomState(3)
    x = rng.randn(B, T, C).astype(np.float32)

    offline, _ = block.apply({"params": params}, jnp.asarray(x))

    cache = rglru.RecurrentBlock.init_cache(B, C)
    outs = []
    for t in range(T):
      # A fresh-sequence (cache=None) first step equals streaming from the
      # zero cache only if the reset normalization agrees; stream from step 0
      # with explicit zero state after computing step 0 with cache=None.
      if t == 0:
        y, cache = block.apply(
            {"params": params}, jnp.asarray(x[:, :1])
        )
      else:
        y, cache = block.apply(
            {"params": params}, jnp.asarray(x[:, t : t + 1]), cache
        )
      outs.append(np.asarray(y))
    np.testing.assert_allclose(
        np.concatenate(outs, 1), np.asarray(offline), rtol=1e-4, atol=1e-5
    )
