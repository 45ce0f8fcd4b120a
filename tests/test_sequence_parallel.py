"""Sequence-parallel linear scan: parity with the single-device scan and
gradient correctness, on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.ops import scan as scan_lib
from tapnet_tpu.parallel import mesh as mesh_lib
from tapnet_tpu.parallel import sequence

B, T, C = 2, 64, 16


def make_inputs(seed=0):
  rng = np.random.RandomState(seed)
  x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1)
  a = jnp.asarray(rng.rand(B, T, C).astype(np.float32) * 0.5 + 0.4)
  h0 = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.1)
  return x, a, h0


class TestSequenceParallelScan:

  def test_matches_single_device(self):
    x, a, h0 = make_inputs()
    mesh = mesh_lib.make_mesh()
    y_ref, h_ref = scan_lib.linear_scan(x, a, h0)
    y, h_last = sequence.sequence_parallel_linear_scan(
        x, a, h0, mesh, time_axis="data"
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_last), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )

  def test_zero_h0_default(self):
    x, a, _ = make_inputs(1)
    mesh = mesh_lib.make_mesh()
    y_ref, _ = scan_lib.linear_scan(
        x, a, jnp.zeros((B, C), jnp.float32)
    )
    y, _ = sequence.sequence_parallel_linear_scan(x, a, None, mesh)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )

  def test_sharded_inputs_jit(self):
    x, a, h0 = make_inputs(2)
    mesh = mesh_lib.make_mesh()
    xs = sequence.shard_time(x, mesh)
    as_ = sequence.shard_time(a, mesh)
    fn = jax.jit(
        lambda x_, a_, h_: sequence.sequence_parallel_linear_scan(
            x_, a_, h_, mesh
        )
    )
    y, h_last = fn(xs, as_, h0)
    y_ref, h_ref = scan_lib.linear_scan(x, a, h0)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_last), np.asarray(h_ref), rtol=1e-5, atol=1e-5
    )

  def test_gradients_match(self):
    x, a, h0 = make_inputs(3)
    mesh = mesh_lib.make_mesh()

    def loss_par(x_, a_):
      y, h = sequence.sequence_parallel_linear_scan(x_, a_, h0, mesh)
      return jnp.sum(y**2) + jnp.sum(h**2)

    def loss_ref(x_, a_):
      y, h = scan_lib.linear_scan(x_, a_, h0)
      return jnp.sum(y**2) + jnp.sum(h**2)

    gx_p, ga_p = jax.grad(loss_par, argnums=(0, 1))(x, a)
    gx_r, ga_r = jax.grad(loss_ref, argnums=(0, 1))(x, a)
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ga_p), np.asarray(ga_r), rtol=1e-4, atol=1e-4
    )

  def test_rejects_indivisible_time(self):
    x, a, h0 = make_inputs(4)
    mesh = mesh_lib.make_mesh()
    import pytest

    with pytest.raises(ValueError, match="divisible"):
      sequence.sequence_parallel_linear_scan(
          x[:, :30], a[:, :30], h0, mesh
      )
