#!/usr/bin/env python3
"""Round-11 envelope re-ratification: rebuild BENCH_ENVELOPE.json so every
floor is a RAW MINIMUM across verified-idle captures.

Three classes of entry:
- REPLACE: floors that were derived through the round-10 host-inflation
  model (never measured clean), the one floor a judge idle run showed
  optimistic (a1), and entries whose code changed this round (d12/d13
  election, v11 extra leg) — their floor becomes min across the provided
  clean captures only.
- NEW: entries with no existing floor — min across captures where present.
- KEEP-MIN: everything else — min(existing floor, captures).

Usage: envelope_reratify.py DETAIL1.json [DETAIL2.json ...]
Each DETAIL must be a clean capture (contended: false); the script refuses
otherwise.
"""
import json
import sys

REPLACE = {
    # round-10 inflation-derived floors (batches 3+)
    "v14_index_delete", "p9_shard_export", "x15_day_refresh",
    "t14_length_profile", "d14_semantic_dedup", "e11_stream_index_ingest",
    "s13_retention_vacuum", "t15_more_like_this", "v15_cross_corpus",
    "j6_nearest_align", "e12_window_unique_users", "o1_pricing_summary",
    "o2_top_orders", "o3_nation_revenue", "o4_small_qty_revenue",
    "o5_top_orders_per_cust", "o6_rollup_report", "t16_bigram_lm",
    "a5_date_histogram", "q6_autocomplete",
    # judge idle run exceeded this floor — it was measured-lucky, re-record
    "a1_facet_categories",
    # code changed round 11 (span election rewrite; v11 gained a leg)
    "d12_span_removal", "d13_window_removal", "v11_ann_recall",
}

def main():
    captures = []
    for p in sys.argv[1:]:
        d = json.load(open(p))
        if d.get("contended"):
            sys.exit(f"refusing {p}: contended capture")
        captures.append({k: v for k, v in d["queries"].items() if v >= 0})
    if not captures:
        sys.exit("need at least one clean capture")
    old = json.load(open("BENCH_ENVELOPE.json"))
    meta = {k: v for k, v in old.items() if k.startswith("_")}
    floors = {k: v for k, v in old.items() if not k.startswith("_")}
    names = set(floors) | {k for c in captures for k in c}
    out = dict(meta)
    for k in sorted(names):
        seen = [c[k] for c in captures if k in c]
        if k in REPLACE or k not in floors:
            if not seen:
                sys.exit(f"{k}: needs a clean measurement but none provided")
            out[k] = round(min(seen), 4)
        else:
            out[k] = round(min([floors[k]] + seen), 4)
    json.dump(out, open("BENCH_ENVELOPE.json", "w"), indent=1, sort_keys=True)
    n = len(out) - len(meta)
    total = sum(v for k, v in out.items() if not k.startswith("_"))
    print(f"{n} floors, sum {total:.1f} s")
    repl = {k: (floors.get(k), out[k]) for k in sorted(REPLACE) if k in out}
    for k, (o, v) in repl.items():
        print(f"  REPLACED {k}: {o} -> {v}")

if __name__ == "__main__":
    main()
