"""TAPNext loss tests: golden behavior + gradient flow through the tracker."""

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.models import ssm_vit, tapnext, tapnext_losses


class TestLossPrimitives:

  def test_huber_regions(self):
    pred = jnp.array([[0.0, 0.0]])
    tgt = jnp.array([[0.0, 0.5]])
    out = tapnext_losses.huber(pred, tgt, delta=1.0)
    np.testing.assert_allclose(out, [[0.125]], rtol=1e-5)
    tgt_far = jnp.array([[0.0, 10.0]])
    out = tapnext_losses.huber(pred, tgt_far, delta=1.0)
    np.testing.assert_allclose(out, [[9.5]], rtol=1e-5)

  def test_coordinate_ce_prefers_correct_bin(self):
    logits = jnp.zeros((1, 512)).at[0, 100].set(10.0).at[0, 256 + 200].set(
        10.0
    )
    good = tapnext_losses.coordinate_cross_entropy(
        logits, jnp.array([[100.5, 200.5]])
    )
    bad = tapnext_losses.coordinate_cross_entropy(
        logits, jnp.array([[50.5, 20.5]])
    )
    assert float(good[0, 0]) < float(bad[0, 0])

  def test_certainty_targets(self):
    logits = jnp.zeros((2, 1))
    pred = jnp.array([[0.0, 0.0], [0.0, 0.0]])
    tgt = jnp.array([[0.1, 0.1], [30.0, 30.0]])
    out = tapnext_losses.certainty(logits, pred, tgt, threshold=1.0)
    # BCE(0 logit) = log(2) for both, but gradients differ in sign; check
    # the is_certain branch via a confident logit instead.
    confident = jnp.full((2, 1), 10.0)
    out = tapnext_losses.certainty(confident, pred, tgt, threshold=1.0)
    assert float(out[0, 0]) < float(out[1, 0])  # certain one has low loss


class TestTrackerLoss:

  def test_loss_and_grads(self):
    config = ssm_vit.SsmVitConfig(
        width=32,
        depth=1,
        mlp_dim=64,
        num_heads=2,
        patch_size=(1, 8, 8),
        image_size=(32, 32),
    )
    model = tapnext.TAPNextTracker(config=config)
    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.rand(1, 3, 32, 32, 3).astype(np.float32))
    qp = jnp.asarray([[[0.0, 8.0, 8.0], [1.0, 16.0, 4.0]]])
    params = model.init(jax.random.PRNGKey(0), video, qp)["params"]

    target = jnp.asarray(rng.rand(1, 2, 3, 2).astype(np.float32) * 32)
    visible = jnp.ones((1, 2, 3))

    def loss_fn(p):
      results = model.apply({"params": p}, video, qp)
      loss, scalars = tapnext_losses.tapnext_loss(results, target, visible)
      return loss, scalars

    (loss, scalars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )
    assert np.isfinite(float(loss))
    assert "coordinate_loss" in scalars
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.abs(g).sum()), grads, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0.0
