"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh; real-TPU runs happen
via bench.py, not the unit-test suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
  os.environ["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8"
  ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The environment may pin JAX_PLATFORMS to a TPU plugin before we run; the
# config update (post-import, pre-backend-init) reliably forces CPU.
jax.config.update("jax_platforms", "cpu")

import sys

REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
  # The reference implementation is used strictly as a read-only numerical
  # oracle in parity tests; it is never shipped or imported by the package.
  sys.path.insert(0, REFERENCE_PATH)
