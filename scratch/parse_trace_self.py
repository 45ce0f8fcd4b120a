"""Self-time (exclusive) attribution of a jax.profiler device trace.

parse_trace.py sums all X events, double-counting parents (jit_forward
contains while contains fusions). Here: per (pid, tid), build the nesting
by start/end containment and report duration minus children — the leaf-op
budget the wall time actually decomposes into.
"""

import collections
import gzip
import json
import re
import sys

path = sys.argv[1]
with gzip.open(path, "rt") as f:
  data = json.load(f)

events = data["traceEvents"]
pid_names = {}
for e in events:
  if e.get("ph") == "M" and e.get("name") == "process_name":
    pid_names[e["pid"]] = e["args"].get("name", "")

device_pids = {
    pid for pid, name in pid_names.items()
    if ("TPU" in name or "/device" in name.lower()) and "#Chip" not in name
}

by_track = collections.defaultdict(list)
for e in events:
  if e.get("ph") != "X" or e.get("pid") not in device_pids:
    continue
  by_track[(e["pid"], e.get("tid"))].append(e)

self_time = collections.Counter()
cnt = collections.Counter()
for track, evs in by_track.items():
  evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
  stack = []
  for e in evs:
    ts, dur = e["ts"], e.get("dur", 0)
    while stack and ts >= stack[-1][0] + stack[-1][1]:
      stack.pop()
    name = re.sub(r"\.[0-9]+$", "", e.get("name", ""))
    name = re.sub(r"_[0-9]+$", "", name)
    if stack:
      # subtract from the parent's self time
      self_time[stack[-1][2]] -= dur
    self_time[name] += dur
    cnt[name] += 1
    stack.append((ts, dur, name))

grand = sum(self_time.values())
print(f"total self time: {grand/1e6:.3f}s")
for name, d in self_time.most_common(40):
  if d <= 0:
    continue
  print(f"{d/1e6:8.3f}s {100*d/grand:5.1f}% x{cnt[name]:<6} {name[:130]}")
