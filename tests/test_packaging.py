"""Packaging surface tests (coverage row 44, reference pyproject.toml:4-17).

The editable install itself is exercised once per environment
(`pip install -e . --no-deps --no-build-isolation`); these tests pin the
declared metadata against the actual tree so the two cannot drift.
"""

import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
  with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
    return tomllib.load(f)


class TestPyproject:

  def test_core_metadata(self, pyproject):
    proj = pyproject["project"]
    assert proj["name"] == "tapnet-tpu"
    deps = {d.split(">=")[0].split("==")[0] for d in proj["dependencies"]}
    # The runtime import surface of tapnet_tpu (everything else is a
    # lazily-imported optional extra).
    assert deps == {"jax", "flax", "optax", "numpy"}
    extras = proj["optional-dependencies"]
    assert "torch" in extras and "viz" in extras

  def test_package_data_files_exist(self, pyproject):
    pkg_data = pyproject["tool"]["setuptools"]["package-data"]
    import glob

    for pkg, patterns in pkg_data.items():
      pkg_dir = os.path.join(REPO, *pkg.split("."))
      for pattern in patterns:
        matches = glob.glob(os.path.join(pkg_dir, pattern))
        assert matches, f"no files match {pkg}/{pattern}"

  def test_all_subpackages_have_init(self):
    # setuptools find() only picks up directories with __init__.py; a
    # missing one would silently drop a subpackage from installs.
    for root, dirs, files in os.walk(os.path.join(REPO, "tapnet_tpu")):
      dirs[:] = [d for d in dirs if d != "__pycache__"]
      rel = os.path.relpath(root, REPO)
      has_py = any(f.endswith(".py") for f in files)
      if has_py:
        assert "__init__.py" in files, f"{rel} lacks __init__.py"

  def test_installed_distribution_if_present(self):
    # After `pip install -e .`, the distribution must resolve and point
    # at this tree. Skipped when not installed (e.g. a bare checkout).
    import importlib.metadata as md

    try:
      dist = md.distribution("tapnet-tpu")
    except md.PackageNotFoundError:
      pytest.skip("tapnet-tpu not pip-installed in this environment")
    assert dist.version
