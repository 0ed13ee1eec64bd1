#!/usr/bin/env python3
"""Merge new-entry floors into BENCH_ENVELOPE.json.

The committed envelope's floors come from a verified-idle run and stay
authoritative for entries they already cover — re-recording them on a
busier host would only raise them and mask regressions. New entries get
floors from the per-query MIN across the provided BENCH_DETAIL captures,
corrected by the host-inflation ratio measured on the UNTOUCHED entry
set of the same captures (median of per-query measured/floor ratios, a
robust uniform-load estimate; capped below at 1.0 so an idle capture
passes through unchanged).

Usage: python3 tools/envelope_update.py BENCH_DETAIL_A.json [B.json ...]
Writes BENCH_ENVELOPE.json in place and prints the added floors.
"""
import json
import statistics
import sys


def main(paths):
    env = json.load(open("BENCH_ENVELOPE.json"))
    floors = {k: v for k, v in env.items() if not k.startswith("_")}
    runs = [json.load(open(p))["queries"] for p in paths]
    best = {}
    for q in runs:
        for k, v in q.items():
            if v >= 0 and (k not in best or v < best[k]):
                best[k] = v
    ratios = [best[k] / floors[k] for k in floors if k in best and floors[k] > 0.3]
    # no already-enveloped entry to estimate inflation from (e.g. a capture
    # of only new entries): assume an idle host rather than crashing
    inflation = max(1.0, statistics.median(ratios)) if ratios else 1.0
    if not ratios:
        print("WARN: no inflation estimate available; assuming 1.0")
    added = {}
    for k, v in sorted(best.items()):
        if k not in floors:
            added[k] = round(v / inflation, 4)
    env.update(added)
    json.dump(env, open("BENCH_ENVELOPE.json", "w"), indent=0, sort_keys=True)
    n = len([k for k in env if not k.startswith("_")])
    total = sum(v for k, v in env.items() if not k.startswith("_"))
    print(f"inflation={inflation:.3f} added={added}")
    print(f"envelope: {n} entries, {total:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1:])
