#!/usr/bin/env python3
"""Merge N single-run BENCH_full maps into one per-query-MEDIAN artifact.

Why (r14 verdict "What's wrong #3"): single-run full-map totals carry
+/-5-10% box noise — same-build re-runs swing individual fixture rows
2-3x, so round-over-round diffs of single draws keep "finding" thin
drift across ~40 unrelated rows that attributes to nothing. The fix is
to compare MEDIANS: run `graft.Bench` N times (each its own fresh JVM,
preserving the cold-run methodology of every prior round's artifact),
then merge here.

Usage: python3 tools/merge_bench.py OUT.json RUN1.json RUN2.json [RUN3.json ...]

The merged artifact keeps the single-run schema (one JSON line:
metric/value/n_queries/queries/warm/cold/total_cold/load_*) so existing
consumers parse it unchanged, and adds:
  "runs": N
  "spread": {query: (max-min)/median per query, 2dp}   # 0 when median=0
  "run_totals": [each run's total]
  "run_loads": [each run's load_start/load5_start/load15_start]
"value"/"queries"/"cold"/"total_cold" are per-query medians; the
"contaminated" tag rides if ANY input run was tagged.
"""
import json
import statistics
import sys


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit("usage: merge_bench.py OUT.json RUN1.json RUN2.json [...]")
    out_path, run_paths = sys.argv[1], sys.argv[2:]
    runs = []
    for p in run_paths:
        with open(p) as f:
            runs.append(json.loads(f.read().strip()))

    names = list(runs[0]["queries"].keys())
    for r in runs[1:]:
        if set(r["queries"].keys()) != set(names):
            sys.exit("query sets differ between runs — refusing to merge")

    def med(vals):
        return statistics.median(vals)

    queries, spread = {}, {}
    for n in names:
        vals = [float(r["queries"][n]) for r in runs]
        m = med(vals)
        queries[n] = round(m, 2)
        spread[n] = round((max(vals) - min(vals)) / m, 2) if m > 0 else 0.0

    cold_names = list(runs[0].get("cold", {}).keys())
    cold = {}
    for n in cold_names:
        vals = [float(r["cold"][n]) for r in runs if n in r.get("cold", {})]
        cold[n] = round(med(vals), 2)

    total = round(sum(queries.values()), 2)
    total_cold = round(sum(cold.get(n, queries[n]) for n in names), 2)
    merged = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "n_queries": len(names),
        "runs": len(runs),
        "queries": queries,
        "spread": spread,
        "warm": runs[0].get("warm", []),
        "cold": cold,
        "total_cold": total_cold,
        "run_totals": [round(float(r["value"]), 2) for r in runs],
        "run_loads": [
            {k: r.get(k) for k in
             ("load_start", "load5_start", "load15_start",
              "load_end", "load5_end", "load15_end")}
            for r in runs],
        "sf": runs[0].get("sf"),
    }
    if any(r.get("contaminated") for r in runs):
        merged["contaminated"] = True
    with open(out_path, "w") as f:
        f.write(json.dumps(merged) + "\n")
    worst = sorted(spread.items(), key=lambda kv: -kv[1])[:8]
    print(f"merged {len(runs)} runs -> {out_path}: total={total}s "
          f"(runs {merged['run_totals']}); worst per-query spreads: "
          + ", ".join(f"{n}={s}" for n, s in worst))


if __name__ == "__main__":
    main()
