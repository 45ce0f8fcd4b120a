"""Device-trace analysis: self-time attribution of jax.profiler traces.

The reference has no profiling subsystem (SURVEY §5.1); here the loop is:

  with profiling.trace("/tmp/trace"):   # utils/profiling.py xprof capture
      forward(...)
  python -m tapnet_tpu.utils.trace_analysis /tmp/trace

or programmatically `component_budget(trace_path, classifier)`. Two views:

  * self_times: exclusive per-op-name totals — parents (jit wrappers,
    while loops) minus their children, computed by start/end containment
    per (pid, tid) track, so the numbers add up to device busy time
    instead of double-counting nesting.
  * component_budget: groups events by model component via a classifier
    over the events' source file / tf_op metadata (a default classifier
    knows this package's kernels and model scopes).

This was the tool that produced the r4 480p budget table in
PERFORMANCE.md (mixer 0.363 s / ExtraConvs 0.204 / backbone 0.180 / corr
0.174 / stage-1 heads 0.074).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import Callable, Dict, List, Mapping, Optional, Tuple

_CONTAINER_PREFIXES = ("jit_", "while")


def _load_events(trace_path: str) -> List[dict]:
  """Loads traceEvents from a trace dir (or a .trace.json.gz file)."""
  path = trace_path
  if os.path.isdir(path):
    matches = sorted(
        glob.glob(
            os.path.join(path, "**", "*.trace.json.gz"), recursive=True
        )
    )
    if not matches:
      raise FileNotFoundError(f"no *.trace.json.gz under {trace_path}")
    path = matches[-1]
  with gzip.open(path, "rt") as f:
    return json.load(f)["traceEvents"]


def _device_pids(events) -> set:
  pid_names = {}
  for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
      pid_names[e["pid"]] = e["args"].get("name", "")
  return {
      pid
      for pid, name in pid_names.items()
      if ("TPU" in name or "/device" in name.lower()) and "#Chip" not in name
  }


def self_times(trace_path: str) -> Dict[str, Tuple[float, int]]:
  """{op base name: (exclusive seconds, count)} over device tracks."""
  events = _load_events(trace_path)
  pids = _device_pids(events)
  by_track = collections.defaultdict(list)
  for e in events:
    if e.get("ph") != "X" or e.get("pid") not in pids:
      continue
    by_track[(e["pid"], e.get("tid"))].append(e)

  out: Dict[str, List[float]] = collections.defaultdict(lambda: [0.0, 0])
  for evs in by_track.values():
    evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    stack: List[Tuple[float, float, str]] = []
    for e in evs:
      ts, dur = e["ts"], e.get("dur", 0)
      while stack and ts >= stack[-1][0] + stack[-1][1]:
        stack.pop()
      name = re.sub(r"\.[0-9]+$", "", e.get("name", ""))
      name = re.sub(r"_[0-9]+$", "", name)
      if stack:
        out[stack[-1][2]][0] -= dur / 1e6
      out[name][0] += dur / 1e6
      out[name][1] += 1
      stack.append((ts, dur, name))
  return {k: (v[0], v[1]) for k, v in out.items() if v[0] > 0}


def default_classifier(e: dict) -> Optional[str]:
  """Maps a trace event to a tapnet_tpu component (None = container)."""
  name = e.get("name", "")
  if name.startswith(_CONTAINER_PREFIXES):
    return None
  args = e.get("args", {})
  src = args.get("source", "")
  top = args.get("tf_op", "")
  if "fused_mixer_block" in src:
    return "mixer_kernel"
  if "corr_tents" in src:
    return "corr_kernel"
  if "fused_extra_convs" in src:
    return "extra_convs_kernel"
  if "qconv" in src:
    return "extra_convs_int8"
  if "scan.py" in src:
    return "rglru_scan_kernel"
  if "cost_volume_head" in top:
    return "stage1_heads"
  if "_backbone_features" in top or "resnet" in src.lower():
    return "backbone"
  if "get_feature_grids" in top:
    return "featuregrid_misc"
  if "_refine_pips" in top or "_corr_patches" in top:
    return "refine_misc"
  if "get_query_features" in top:
    return "query_features"
  if "estimate_trajectories" in top:
    return "traj_misc"
  if "ssm_block" in top or "rglru" in src:
    return "ssm"
  return "other"


def component_budget(
    trace_path: str,
    classifier: Callable[[dict], Optional[str]] = default_classifier,
) -> Dict[str, Tuple[float, int]]:
  """{component: (inclusive seconds, count)} over device tracks.

  Inclusive per classified event (containers return None and are skipped),
  so with a classifier whose classes don't nest, totals match wall time.
  """
  events = _load_events(trace_path)
  pids = _device_pids(events)
  out: Dict[str, List[float]] = collections.defaultdict(lambda: [0.0, 0])
  for e in events:
    if e.get("ph") != "X" or e.get("pid") not in pids:
      continue
    c = classifier(e)
    if c is None:
      continue
    out[c][0] += e.get("dur", 0) / 1e6
    out[c][1] += 1
  return {k: (v[0], v[1]) for k, v in out.items()}


def main() -> None:
  import argparse

  parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
  parser.add_argument("trace", help="trace dir or .trace.json.gz")
  parser.add_argument("--raw", action="store_true",
                      help="per-op self times instead of components")
  parser.add_argument("--top", type=int, default=25)
  args = parser.parse_args()

  table = (
      self_times(args.trace) if args.raw else component_budget(args.trace)
  )
  total = sum(t for t, _ in table.values())
  print(f"total classified device time: {total:.3f}s")
  for name, (t, n) in sorted(
      table.items(), key=lambda kv: -kv[1][0]
  )[: args.top]:
    print(f"{t:8.3f}s {100 * t / max(total, 1e-12):5.1f}% x{n:<7} {name}")


if __name__ == "__main__":
  main()
