#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's t2 gate:
run graft.Verify (Spark) into OUT_DIR, then execute each oracle SQL in
DuckDB over the same parquet tables and compare results (columns sorted
by name, rows sorted, exact value equality).

Usage: python3 scripts/check.py [sfdir] [outdir] [--skip-verify] [query...]
"""
import json, math, sys, subprocess, os
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
flags = [a for a in sys.argv[3:]]
skip_verify = "--skip-verify" in flags
only = [a for a in flags if not a.startswith("--")]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if not skip_verify:
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1800)
    # build.sbt sets showSuccess := false (keeps Bench's JSON the last
    # stdout line), so detect failure by exit code, not the banner
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-2000:])
        sys.exit("verify run failed")

con = duckdb.connect()
for t in TABLES:
    # the driver's testdata is one parquet FILE per table; Spark-written
    # replicas (ScaleTrial 10x dirs) are DIRECTORIES of part files
    p = f"{SF}/{t}.parquet"
    if os.path.isdir(p):
        p += "/*.parquet"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
outdirs = sorted(d for d in os.listdir(OUT) if os.path.isdir(f"{OUT}/{d}"))
names = only or sorted(set(oracle) | set(outdirs))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

fails = 0
for name in names:
    sql = oracle.get(name)
    pdir = f"{OUT}/{name}"
    if not os.path.isdir(pdir):
        print(f"MISSING  {name} (no spark output)"); fails += 1; continue
    try:
        sp_rel = con.execute(f"SELECT * FROM '{pdir}/*.parquet'")
        sp_cols = [d[0] for d in sp_rel.description]
        sp_rows = sp_rel.fetchall()
    except Exception as e:
        print(f"READFAIL {name}: {e}"); fails += 1; continue
    if sql is None:
        print(f"NOORACLE {name}: rows={len(sp_rows)}"); continue
    try:
        du_rel = con.execute(sql)
        du_cols = [d[0] for d in du_rel.description]
        du_rows = du_rel.fetchall()
    except Exception as e:
        print(f"SQLFAIL  {name}: {str(e)[:300]}"); fails += 1; continue
    # Type guard: fetchall() compares Python values (int == int at any
    # width), but the driver hashes FORMATTED values — an oracle column
    # DuckDB widens to HUGEINT (arrow decimal128, e.g. an uncast
    # SUM(BIGINT)) or to float formats differently than Spark's int64
    # even when every value is equal. Catch the class locally.
    try:
        du_sch = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema
        sp_sch = con.execute(
            f"SELECT * FROM '{pdir}/*.parquet' LIMIT 0").arrow().schema
        sp_types = {f.name: str(f.type) for f in sp_sch}
        INTEGRAL = ("int8", "int16", "int32", "int64",
                    "uint8", "uint16", "uint32", "uint64")
        widened = []
        for f in du_sch:
            du_t, sp_t = str(f.type), sp_types.get(f.name, "")
            # decimal oracle vs non-decimal Spark: the HUGEINT class
            if "decimal" in du_t and "decimal" not in sp_t:
                widened.append((f.name, du_t, sp_t))
            # float oracle vs integral Spark: formats 1.0 vs 1
            elif du_t in ("float", "double") and sp_t in INTEGRAL:
                widened.append((f.name, du_t, sp_t))
            # the REVERSE direction diverges identically (round-10
            # advisor finding): integral oracle vs float/double Spark
            elif du_t in INTEGRAL and sp_t in ("float", "double"):
                widened.append((f.name, du_t, sp_t))
            elif "decimal" in sp_t and "decimal" not in du_t:
                widened.append((f.name, du_t, sp_t))
        if widened:
            print(f"TYPEWIDE {name}: oracle widens {widened} vs spark — "
                  f"CAST the oracle column to the exact Spark type "
                  f"(formatted-value hashing diverges at equal values)")
            fails += 1
            continue
    except Exception:
        pass
    sc, sr = canon(sp_rows, sp_cols)
    dc, dr = canon(du_rows, du_cols)
    if sc != dc:
        print(f"SCHEMA   {name}: spark={sc} duck={dc}"); fails += 1; continue
    if len(sr) != len(dr):
        print(f"ROWCOUNT {name}: spark={len(sr)} duck={len(dr)}"); fails += 1; continue
    bad = None
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            # tolerate float repr equality
            same = all(
                (x == y) or (isinstance(x, float) and isinstance(y, float)
                             and (math.isnan(x) and math.isnan(y) or x == y))
                for x, y in zip(a, b))
            if not same:
                bad = (i, a, b); break
    if bad:
        print(f"VALUES   {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
        fails += 1
    else:
        print(f"OK       {name}: {len(sr)} rows")

sys.exit(1 if fails else 0)
