#!/usr/bin/env python3
"""Merge the JSON lines a graft.ScaleProbe run printed into SCALE_PROBE.json.

Each probe line is {"metric": "<name>", ...}; the committed artifact is one
object whose top level carries the main candidate sweep (metric
"scale_probe") inline and every other probe under its metric name. Usage:

    python3 tools/merge_probe.py <probe-run.log> [metric ...]

With metric names given, only those lines are merged (the usual case: a
targeted re-run must not clobber other probes' committed evidence).
"""
import json
import re
import sys

log_path = sys.argv[1]
only = set(sys.argv[2:])

lines = []
for raw in open(log_path, errors="replace"):
    m = re.search(r'\{"metric":.*\}', raw)
    if m:
        lines.append(json.loads(m.group(0)))

with open("SCALE_PROBE.json") as f:
    doc = json.load(f)

merged = []
for obj in lines:
    name = obj["metric"]
    if only and name not in only:
        continue
    if name == "scale_probe":
        doc.update(obj)
    else:
        doc[name] = obj
    merged.append(name)

with open("SCALE_PROBE.json", "w") as f:
    json.dump(doc, f, indent=1)
    f.write("\n")
print("merged:", merged)
