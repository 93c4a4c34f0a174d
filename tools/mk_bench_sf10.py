#!/usr/bin/env python3
"""Assemble BENCH_sf10.json from DecadeBench '[decade]' lines.

Usage: mk_bench_sf10.py <decade.log> > BENCH_sf10.json

Superlinear rule: a query is flagged when its TWO-DECADE total growth
x100/base exceeds 1.25 * 100 (stricter than compounding the per-decade
1.25*10 rule, which allows 156x) with a 0.25 s floor on the base to keep
measurement noise out of the denominator. Per-decade growths are
reported for attribution either way.
"""
import json
import re
import sys

rows = {}
pat = re.compile(
    r"\[decade\]\s+(\S+)\s+base=\s*([\d.]+)s\s+x10=\s*([\d.]+)s"
    r"\s+x100=\s*([\d.]+)s")
for line in open(sys.argv[1]):
    m = pat.search(line)
    if not m:
        continue
    name, b, t1, t2 = m.group(1), float(m.group(2)), float(m.group(3)), float(m.group(4))
    rows[name] = {
        "base": b, "x10": t1, "x100": t2,
        "growth1": round(t1 / max(b, 1e-9), 2),
        "growth2": round(t2 / max(t1, 1e-9), 2),
        "growth_total": round(t2 / max(b, 1e-9), 2),
    }

superlinear = [n for n, r in rows.items()
               if r["x100"] / max(r["base"], 0.25) > 125.0]

# Attribution for growth terms measured by tools/PairGrowth: the LSH
# near-dup family is OUTPUT-bound — ScaleGen's K-fold replication grows
# duplicate DENSITY as well as volume (word-permuted replicas of one
# original still collide in MinHash bands -> ~replicas^2 genuine pairs
# per original), so wall tracks verified-pair count, not corpus size.
notes = {
    "dedup_minhash_lsh": (
        "output-bound: verified pairs 2,630 -> 272,155 (103x) -> "
        "25,496,148 (94x) per decade while cost/pair FALLS 775 -> 10.3 "
        "-> 0.7 us (tools/PairGrowth); the wall growth is the replica "
        "corpus genuinely containing ~100x more near-dup pairs per "
        "decade, not a quadratic in the operator"),
}
out = {
    "metric": "decade_growth",
    "k_per_decade": 10,
    "method": "per-query isolated JVM (fresh heap each), local[32], 64g, "
              "shuffle.partitions=256 (AQE coalesces at small sf); "
              "cold run + min of 3 warm runs per dir",
    "n_queries": len(rows),
    "base_total": round(sum(r["base"] for r in rows.values()), 2),
    "x10_total": round(sum(r["x10"] for r in rows.values()), 2),
    "x100_total": round(sum(r["x100"] for r in rows.values()), 2),
    "superlinear": superlinear,
    "notes": {k: v for k, v in notes.items() if k in rows},
    "queries": rows,
}
print(json.dumps(out, indent=1))
