"""Tests for optical-flow-assisted track annotation."""

import numpy as np

from tapnet_tpu.utils import flow_track_assist


def _constant_flow(t, h, w, dx, dy):
  f = np.zeros((t, h, w, 2), np.float32)
  f[..., 0] = dx
  f[..., 1] = dy
  return f


class TestChainFlow:

  def test_constant_flow_straight_line(self):
    flows = _constant_flow(10, 32, 32, 1.0, 0.5)
    track = flow_track_assist.chain_flow(flows, (4.0, 4.0))
    assert track.shape == (11, 2)
    np.testing.assert_allclose(track[:, 0], 4.0 + np.arange(11), atol=1e-5)
    np.testing.assert_allclose(
        track[:, 1], 4.0 + 0.5 * np.arange(11), atol=1e-5
    )

  def test_subpixel_bilinear(self):
    # Flow varies linearly in x; bilinear sampling must interpolate.
    flows = np.zeros((1, 8, 8, 2), np.float32)
    flows[0, :, :, 0] = np.arange(8)[None, :]
    track = flow_track_assist.chain_flow(flows, (2.5, 3.0))
    assert abs(track[1, 0] - (2.5 + 2.5)) < 1e-4


class TestInterpolateTrack:

  def test_recovers_constant_motion(self):
    flows = _constant_flow(6, 24, 24, 2.0, 1.0)
    track = flow_track_assist.interpolate_track(
        flows, start=(2, 3), end=(14, 9), radius=4
    )
    assert track.shape == (7, 2)
    np.testing.assert_allclose(track[0], (2, 3))
    np.testing.assert_allclose(track[-1], (14, 9))
    # Intermediate positions follow the flow exactly.
    for t in range(7):
      np.testing.assert_allclose(track[t], (2 + 2 * t, 3 + t), atol=1e-5)

  def test_endpoints_pinned_against_noisy_flow(self):
    rng = np.random.RandomState(0)
    flows = _constant_flow(5, 20, 20, 1.0, 0.0)
    flows += rng.uniform(-0.3, 0.3, flows.shape).astype(np.float32)
    track = flow_track_assist.interpolate_track(
        flows, start=(3, 10), end=(8, 10), radius=3
    )
    np.testing.assert_allclose(track[0], (3, 10))
    np.testing.assert_allclose(track[-1], (8, 10))
    # Path stays near the true line despite the noise.
    assert np.all(np.abs(track[:, 1] - 10) <= 2)

  def test_detour_when_flow_curves(self):
    # Flow points diagonally; a straight start->end line would fight it.
    flows = _constant_flow(4, 16, 16, 1.0, 1.0)
    track = flow_track_assist.interpolate_track(
        flows, start=(2, 2), end=(6, 6), radius=3
    )
    # Monotone progression along both axes.
    assert np.all(np.diff(track[:, 0]) >= 0)
    assert np.all(np.diff(track[:, 1]) >= 0)
