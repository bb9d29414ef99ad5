#!/usr/bin/env python3
"""Refresh src/main/resources/bench_budget.json from Bench runs
(VERDICT r17 #3: the driver regenerated /root/testdata at r17 round
start, so pins measured on the previous fixtures drift from what the
bench actually runs; pins must be re-measured on the CURRENT fixtures
whenever a regen lands).

Usage: tools/refresh_budget.py ANCHOR [AUX ...]

Each argument is either a Bench stdout capture (the LAST
{"metric":"detail",...} line is parsed) or a committed bench artifact
JSON (an object with "queries"/"sentinel"/"sentinels" keys). The ANCHOR
run must be QUIET — every intra-run sentinel sample below the loaded
threshold 0.45, series median at the calibrated quiet baseline
(<= 0.18) and end sentinel <= 0.07 — because it establishes the pin
level. AUX runs need no quiet gate: they contribute only through min(),
and a loaded run's per-query MINIMUM is still a valid witness that the
query can run that fast (it can only move a pin DOWN from the anchor).

The new pin per query is the min across all given runs. Refuses to
write if the anchor fails the quiet gates or any declared query is
missing from any run. Prints per-query old->new for pins that moved
more than 25% either way.
"""
import json
import statistics
import sys

BUDGET = "src/main/resources/bench_budget.json"
LOAD_THRESHOLD = 0.45    # Bench.loadCorrelatedThreshold
# The anchor gates are deliberately TIGHTER than the tripwire-adjudication
# threshold: a run whose series medianed 0.23 with end sentinel 0.09 read
# 2.07x budget sum fleet-wide (r18 run 1, box draining after a 55-min
# WireBench) while every sample stayed under 0.45 -- pins must come from
# a run at the calibrated quiet baseline (~0.15 median / 0.22 max, end
# ~0.051), not merely an un-loaded one.
END_SENTINEL_MAX = 0.07
SERIES_MEDIAN_MAX = 0.18


def load_run(path):
    """Return the parsed run dict from a log capture or artifact JSON."""
    text = open(path, encoding="utf-8").read()
    try:
        d = json.loads(text)
        if "queries" in d:
            return d
    except ValueError:
        pass
    last = None
    for line in text.splitlines():
        i = line.find('{"metric":"detail"')
        if i >= 0:
            last = json.loads(line[i:])
    if last is None:
        sys.exit(f"{path}: neither an artifact JSON nor a log with a "
                 "detail line")
    return last


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    runs = [load_run(p) for p in sys.argv[1:]]
    anchor_path, anchor = sys.argv[1], runs[0]
    sents = anchor.get("sentinels", [])
    end = anchor.get("sentinel", [None, None])[1]
    if not sents or max(sents) >= LOAD_THRESHOLD:
        sys.exit(f"{anchor_path}: anchor NOT quiet (series max "
                 f"{max(sents) if sents else 'n/a'} >= {LOAD_THRESHOLD})")
    if statistics.median(sents) > SERIES_MEDIAN_MAX:
        sys.exit(f"{anchor_path}: anchor NOT quiet (series median "
                 f"{statistics.median(sents):.3f} > {SERIES_MEDIAN_MAX})")
    if end is None or end > END_SENTINEL_MAX:
        sys.exit(f"{anchor_path}: anchor NOT quiet (end sentinel {end} > "
                 f"{END_SENTINEL_MAX})")
    for p, d in zip(sys.argv[1:], runs):
        if any(v < 0 for v in d["queries"].values()):
            sys.exit(f"{p}: run contains failed queries")
        # an aux run captured at a different scale factor would silently
        # drag every pin to that fixture's minima through min()
        if d.get("sf") != anchor.get("sf"):
            sys.exit(f"{p}: sf {d.get('sf')!r} != anchor sf "
                     f"{anchor.get('sf')!r} - refusing cross-sf min()")
    old = json.load(open(BUDGET))
    # the declared set is the ANCHOR run's query list (a full bench run
    # covers every declared query) - iterating only old-budget keys would
    # silently leave a newly added query unpinned forever
    declared = set(anchor["queries"]) | set(old)
    new = {}
    for q in sorted(declared):
        vals = [d["queries"].get(q) for d in runs]
        if any(v is None for v in vals):
            sys.exit(f"{q}: missing from a run - refusing partial refresh")
        new[q] = min(vals)
        if q not in old:
            print(f"  {q}: NEW pin {new[q]:.3f} (no previous entry)")
            old[q] = new[q]
    moved = {q: (old[q], new[q]) for q in old
             if new[q] > old[q] * 1.25 or new[q] < old[q] * 0.75}
    for q, (o, n) in sorted(moved.items(), key=lambda kv: -kv[1][1] / kv[1][0]):
        print(f"  {q}: {o:.3f} -> {n:.3f} ({n / o:.2f}x)")
    print(f"{len(moved)}/{len(old)} pins moved >25%; "
          f"budget sum {sum(old.values()):.1f} -> {sum(new.values()):.1f} s")
    with open(BUDGET, "w", encoding="utf-8") as f:
        # indent=0 already emits one newline per item; the default ","
        # item separator keeps it one entry per line (",\n" doubled every
        # line - r18 code-review #6)
        json.dump({q: round(v, 3) for q, v in sorted(new.items())}, f,
                  indent=0, separators=(",", ": "))
        f.write("\n")
    print(f"wrote {BUDGET}")


if __name__ == "__main__":
    main()
