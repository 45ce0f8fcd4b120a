"""Parse a jax.profiler trace.json.gz: sum device op durations by name."""

import collections
import gzip
import json
import re
import sys

path = sys.argv[1]
with gzip.open(path, "rt") as f:
  data = json.load(f)

events = data["traceEvents"]
# Identify device (TPU) process ids from metadata.
pid_names = {}
for e in events:
  if e.get("ph") == "M" and e.get("name") == "process_name":
    pid_names[e["pid"]] = e["args"].get("name", "")

device_pids = {
    pid for pid, name in pid_names.items()
    if ("TPU" in name or "/device" in name.lower()) and "#Chip" not in name
}
print("processes:", pid_names, file=sys.stderr)

tot = collections.Counter()
cnt = collections.Counter()
total_span = collections.defaultdict(lambda: [1e30, -1e30])
for e in events:
  if e.get("ph") != "X" or e.get("pid") not in device_pids:
    continue
  name = e.get("name", "")
  dur = e.get("dur", 0)
  # Strip XLA unique suffixes for grouping.
  base = re.sub(r"\.[0-9]+$", "", name)
  base = re.sub(r"_[0-9]+$", "", base)
  tot[base] += dur
  cnt[base] += 1
  s = total_span[e["pid"]]
  s[0] = min(s[0], e["ts"])
  s[1] = max(s[1], e["ts"] + dur)

grand = sum(tot.values())
print(f"total device op time: {grand/1e6:.3f}s")
for name, d in tot.most_common(45):
  print(f"{d/1e6:8.3f}s {100*d/grand:5.1f}% x{cnt[name]:<6} {name[:140]}")
