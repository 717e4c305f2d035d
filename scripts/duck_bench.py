#!/usr/bin/env python3
"""Time the oracle SQL suite in DuckDB over the same parquet tables —
a measured single-node comparator for the Spark engine's bench, since
the reference publishes no numbers (BASELINE.md). Each query runs in a
subprocess with a timeout so a pathological oracle (recursive CTEs at
sf0.1) can't hang the sweep.

Protocol matches the Spark bench (Bench.scala): two timed passes on
one warm connection, per-query MIN — so both engines are measured at
steady state with their caches warm, not cold-start vs warm-cache.
Connection setup + view registration stay outside the timed region on
both sides (Spark's table cache materializes pre-sweep).

Usage: python3 scripts/duck_bench.py [sfdir] [oracle_sql.json] [out.json]
"""
import json, os, subprocess, sys, time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v01/oracle_sql.json"
OUT = sys.argv[3] if len(sys.argv) > 3 else "duck_bench.json"
TIMEOUT = 300

WORKER = r"""
import duckdb, json, os, sys, time
sf, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    # single-file testdata or a Spark-written directory of part files
    p = f"{sf}/{t}.parquet"
    if os.path.isdir(p):
        p += "/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
# force every output column server-side: the Spark bench times a
# per-column count(col) aggregate (Bench.force) so Catalyst can't
# prune dead columns or eliminate joins; COUNT(COLUMNS(*)) is the
# symmetric DuckDB shape — all columns evaluated, nothing
# materialized into Python. Two passes, min — the Spark bench's
# exact protocol (min of two interleaved sweeps over session-cached
# tables).
secs = []
for _ in range(2):
    t0 = time.time()
    row = con.execute(f"SELECT COUNT(*), COUNT(COLUMNS(*)) FROM ({sql})").fetchone()
    rows = row[0]
    secs.append(time.time() - t0)
print(json.dumps({"sec": min(secs), "rows": rows}))
"""

oracle = json.load(open(ORACLE))
results = {}
for name in sorted(oracle):
    try:
        r = subprocess.run([sys.executable, "-c", WORKER, SF],
                           input=oracle[name], capture_output=True,
                           text=True, timeout=TIMEOUT)
        if r.returncode == 0:
            # rc 0 with empty/non-JSON stdout (stray warning ordering,
            # OOM-killed child reaped as 0) must not abort the sweep —
            # record it like any other per-query failure
            try:
                results[name] = json.loads(r.stdout.strip().splitlines()[-1])
            except (ValueError, IndexError):
                results[name] = {"error": "unparseable worker stdout: "
                                 + r.stdout.strip()[-200:]}
        else:
            results[name] = {"error": r.stderr.strip()[-300:]}
    except subprocess.TimeoutExpired:
        results[name] = {"timeout_s": TIMEOUT}
    v = results[name]
    print(f"{name:28s} {v.get('sec', v):>10}" if isinstance(v.get('sec'), float)
          else f"{name:28s} {v}")

ok = {k: v for k, v in results.items() if "sec" in v}
summary = {"sf": SF, "n_ok": len(ok), "n_total": len(oracle),
           "total_sec_ok": round(sum(v["sec"] for v in ok.values()), 3),
           "timeouts": [k for k, v in results.items() if "timeout_s" in v],
           "errors": [k for k, v in results.items() if "error" in v],
           "queries": {k: round(v["sec"], 3) for k, v in ok.items()}}
json.dump(summary, open(OUT, "w"), indent=1)
print(json.dumps({k: summary[k] for k in
                  ("n_ok", "n_total", "total_sec_ok", "timeouts", "errors")}))
