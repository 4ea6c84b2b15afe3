#!/usr/bin/env python3
"""Maintain bench-results/BENCH_BEST_<sf>.json — the per-query
best-known-floor map: min-of-medians across every recorded same-scale
bench sweep.

Why a floor map instead of one blessed quiet record: a single record
can itself be captured in a moderate sustained slow phase its sentinel
missed (the round-10 sf0.1 record ran ~1.14x slow and read WORSE than
the driver sweep for dozens of queries). The min across all recorded
sweeps converges on the true quiet floor monotonically; slow-phase
values can only be higher and never poison a min. The one class that
can be artificially LOW — floor-normalized suspect ESTIMATES — is
excluded from the merge.

graft.Bench updates the map automatically after each sweep; this tool
(re)seeds it from historical records and lets you merge driver
BENCH_r{N}.json wrappers by hand.

Usage:
  python3 tools/bench_best.py RECORD.json [RECORD2.json ...]

Each record's "sf" field routes it to the right BENCH_BEST_<sf>.json.
Prints per-file floor updates. Idempotent.

Caveat: if a query is RESTRUCTURED to do more work (a probe grows, a
fixture doubles), its old floor is stale-low and will read as a
permanent "mover" — delete that entry from the map (or regenerate the
map from post-change records only) when you change a query's workload.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_diff import load_doc  # noqa: E402

BENCH_DIR = "bench-results"


def merge(record_path):
    doc = load_doc(record_path)
    sf = os.path.basename(doc.get("sf", ""))
    if not sf:
        print(f"  skip {record_path}: no sf field")
        return
    suspects = set(doc.get("suspects", []))
    incoming = {k: float(v) for k, v in doc["queries"].items()
                if float(v) >= 0 and k not in suspects}
    best_path = os.path.join(BENCH_DIR, f"BENCH_BEST_{sf}.json")
    best = {}
    if os.path.exists(best_path):
        with open(best_path) as f:
            best = {k: float(v) for k, v in json.load(f)["queries"].items()}
    lowered, added = 0, 0
    for k, v in incoming.items():
        if k not in best:
            best[k] = v
            added += 1
        elif v < best[k]:
            best[k] = v
            lowered += 1
    os.makedirs(BENCH_DIR, exist_ok=True)
    qs = ",".join(f'"{k}":{best[k]:.3f}' for k in sorted(best))
    with open(best_path, "w") as f:
        f.write('{"metric":"best_floor","unit":"sec","sf":"%s","queries":{%s}}\n'
                % (sf, qs))
    print(f"  {record_path} -> {best_path}: {added} new, {lowered} lowered, "
          f"{len(suspects)} suspect-excluded, {len(best)} total")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    for p in sys.argv[1:]:
        merge(p)
    return 0


if __name__ == "__main__":
    sys.exit(main())
