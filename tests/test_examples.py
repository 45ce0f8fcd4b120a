"""Smoke tests: every example script runs end-to-end with no checkpoint.

The examples double as pipeline integration tests (synthetic data + random
weights); run in-process so conftest's forced-CPU backend applies.
"""

import importlib
import sys

import pytest


def run_example(monkeypatch, module_name, argv):
  mod = importlib.import_module(module_name)
  monkeypatch.setattr(sys, "argv", [module_name] + argv)
  mod.main()


class TestExamples:

  # The default suite runs every pipeline with `--tiny` / the `mu` TAPNext
  # variant: full-size configs compile for minutes on the CPU backend and
  # belong to the slow marker (test_examples_fullsize.py there if needed).

  def test_tapir_offline(self, monkeypatch, tmp_path):
    run_example(
        monkeypatch,
        "examples.tapir_offline",
        ["--resize", "64", "64", "--num_frames", "6", "--tiny",
         "--out", str(tmp_path / "t.mp4")],
    )

  def test_tapir_online(self, monkeypatch, tmp_path):
    run_example(
        monkeypatch,
        "examples.tapir_online",
        ["--resize", "64", "64", "--num_frames", "4", "--grid_stride", "32",
         "--tiny", "--out", str(tmp_path / "t.mp4")],
    )

  def test_tapir_rainbow(self, monkeypatch, tmp_path):
    run_example(
        monkeypatch,
        "examples.tapir_rainbow",
        ["--resize", "64", "64", "--num_frames", "5", "--tiny",
         "--out", str(tmp_path / "t.mp4")],
    )

  def test_tapnext_offline(self, monkeypatch, tmp_path):
    run_example(
        monkeypatch,
        "examples.tapnext_tracking",
        ["--num_frames", "3", "--grid_stride", "128", "--variant", "mu",
         "--out", str(tmp_path / "t.mp4")],
    )

  def test_tapnext_streaming(self, monkeypatch, tmp_path):
    run_example(
        monkeypatch,
        "examples.tapnext_tracking",
        ["--num_frames", "3", "--grid_stride", "128", "--streaming",
         "--variant", "mu", "--out", str(tmp_path / "t.mp4")],
    )

  def test_trajan_roundtrip(self, monkeypatch):
    run_example(
        monkeypatch,
        "examples.trajan_roundtrip",
        ["--num_tracks", "4", "--num_frames", "50"],
    )

  def test_robotap_clustering(self, monkeypatch):
    run_example(
        monkeypatch,
        "examples.robotap_clustering",
        ["--final_num_cats", "2", "--iters_before_split", "50"],
    )

  def test_flow_track_assist(self, monkeypatch):
    run_example(
        monkeypatch, "examples.flow_track_assist", ["--radius", "4"]
    )
