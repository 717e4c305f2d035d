#!/usr/bin/env python3
"""Reduce one Spark/DuckDB bench pair to the comparable ratio.

Protocol (BASELINE.md §2b): batch-only — the streaming pipelines are
excluded (state stores + micro-batch triggers vs plain SQL: different
work, same answers), and any query absent from either side (DuckDB
timeout/error, e.g. q41's recursive CTE) is excluded from BOTH sums
with its name recorded, so a timeout can never flatter either engine.

Usage: python3 scripts/pair_report.py <bench_detail.json> <duck_bench.json>
"""
import json
import sys

spark = json.load(open(sys.argv[1]))
duck = json.load(open(sys.argv[2]))

streaming = set(spark.get("streaming", []))
sq = spark["queries"]
dq = duck["queries"]

excluded = {
    "streaming (spark-only work)": sorted(streaming),
    "duck timeout": sorted(duck.get("timeouts", [])),
    "duck error": sorted(duck.get("errors", [])),
    "missing on a side": sorted(
        (set(sq) ^ set(dq)) - streaming
        - set(duck.get("timeouts", [])) - set(duck.get("errors", []))),
}
comparable = sorted((set(sq) & set(dq)) - streaming)

s_tot = sum(sq[q] for q in comparable)
d_tot = sum(dq[q] for q in comparable)
print(f"comparable queries : {len(comparable)}")
print(f"spark batch total  : {s_tot:8.1f} s   "
      f"(full spark total {spark.get('value', 0):.1f} s, "
      f"streaming {spark.get('streaming_total', 0):.1f} s)")
print(f"duckdb total       : {d_tot:8.1f} s")
if not comparable:
    print("ratio              : n/a (no comparable queries — "
          "mismatched artifact pair?)")
else:
    ratio = s_tot / d_tot if d_tot else float('nan')
    print(f"ratio              : {ratio:8.2f}x")
for why, names in excluded.items():
    if names:
        print(f"excluded [{why}]: {' '.join(names)}")

rows = [(sq[q] / max(dq[q], 1e-3), sq[q], dq[q], q) for q in comparable]
print("\nslowest spark-vs-duck (ratio, spark_s, duck_s):")
for r, s, d, q in sorted(rows, reverse=True)[:12]:
    print(f"  {q:28s} {r:7.1f}x {s:7.2f} {d:7.2f}")
print("\nspark ahead (ratio < 1):")
ahead = [x for x in rows if x[0] < 1.0]
for r, s, d, q in sorted(ahead)[:12]:
    print(f"  {q:28s} {r:7.2f}x {s:7.2f} {d:7.2f}")
print(f"  ... {len(ahead)} queries total where Spark beats DuckDB")
print("\nslowest spark absolute:")
for q in sorted(comparable, key=lambda q: -sq[q])[:12]:
    print(f"  {q:28s} {sq[q]:7.2f} s   (duck {dq[q]:7.2f} s)")
