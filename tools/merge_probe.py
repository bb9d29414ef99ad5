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
import os
import sys

log_path = sys.argv[1]
only = set(sys.argv[2:])

# Parse defensively (ADVICE r16 #3): a greedy regex grabbed to the LAST
# `}` on a line, so trailing log text after the JSON object (or two
# objects on one line) aborted the merge. raw_decode consumes exactly one
# object per anchor; anchors that don't parse are skipped, not fatal.
decoder = json.JSONDecoder()
lines = []
for raw in open(log_path, errors="replace"):
    idx = raw.find('{"metric":')
    while idx >= 0:
        try:
            obj, end = decoder.raw_decode(raw, idx)
            lines.append(obj)
        except ValueError:
            end = idx + 1
        idx = raw.find('{"metric":', max(end, idx + 1))

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

# write-then-rename so a failure mid-dump can never leave the committed
# artifact half-written (ADVICE r16 #3)
tmp = "SCALE_PROBE.json.tmp"
with open(tmp, "w") as f:
    json.dump(doc, f, indent=1)
    f.write("\n")
os.replace(tmp, "SCALE_PROBE.json")
print("merged:", merged)
