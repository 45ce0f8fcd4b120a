"""Trace-analysis tests: self-time nesting math and component grouping on
a synthetic trace file."""

import gzip
import json

from tapnet_tpu.utils import trace_analysis


def write_trace(tmp_path, events):
  meta = [
      {"ph": "M", "name": "process_name", "pid": 1,
       "args": {"name": "/device:TPU:0"}},
      {"ph": "M", "name": "process_name", "pid": 9,
       "args": {"name": "python host"}},
  ]
  path = tmp_path / "vm.trace.json.gz"
  with gzip.open(path, "wt") as f:
    json.dump({"traceEvents": meta + events}, f)
  return str(path)


def ev(name, ts, dur, pid=1, tid=0, **args):
  return {"ph": "X", "name": name, "ts": ts, "dur": dur, "pid": pid,
          "tid": tid, "args": args}


class TestSelfTimes:

  def test_parent_excludes_children(self, tmp_path):
    # jit(0..100) contains fusion(10..40) and fusion(50..70) -> jit self 50.
    path = write_trace(tmp_path, [
        ev("jit_f(123)", 0, 100),
        ev("fusion.1", 10, 30),
        ev("fusion.2", 50, 20),
    ])
    out = trace_analysis.self_times(path)
    assert abs(out["fusion"][0] - 50e-6) < 1e-12
    assert out["fusion"][1] == 2
    assert abs(out["jit_f(123)"][0] - 50e-6) < 1e-12

  def test_host_events_ignored(self, tmp_path):
    path = write_trace(tmp_path, [
        ev("fusion.1", 0, 10),
        ev("hostwork", 0, 1000, pid=9),
    ])
    out = trace_analysis.self_times(path)
    assert "hostwork" not in out

  def test_directory_input(self, tmp_path):
    write_trace(tmp_path, [ev("fusion.9", 0, 5)])
    out = trace_analysis.self_times(str(tmp_path))
    assert abs(out["fusion"][0] - 5e-6) < 1e-12


class TestComponentBudget:

  def test_groups_by_source_and_scope(self, tmp_path):
    path = write_trace(tmp_path, [
        ev("jit_forward(1)", 0, 1000),  # container -> skipped
        ev("branch_0_fun.2", 0, 100,
           source="/x/tapnet_tpu/ops/fused_mixer_block.py"),
        ev("branch_0_fun.3", 200, 50,
           source="/x/tapnet_tpu/ops/corr_tents.py"),
        ev("convolution.1", 300, 30,
           tf_op="jit(forward)/TAPIR/TAPIR._backbone_features/conv:"),
        ev("fusion.4", 400, 20,
           tf_op="jit(forward)/TAPIR/cost_volume_head/pos_conv:"),
        ev("fusion.5", 500, 10),
    ])
    out = trace_analysis.component_budget(path)
    assert abs(out["mixer_kernel"][0] - 100e-6) < 1e-12
    assert abs(out["corr_kernel"][0] - 50e-6) < 1e-12
    assert abs(out["backbone"][0] - 30e-6) < 1e-12
    assert abs(out["stage1_heads"][0] - 20e-6) < 1e-12
    assert abs(out["other"][0] - 10e-6) < 1e-12
    assert "jit_forward(1)" not in out
