#!/usr/bin/env python3
"""Build the adversarial edge fixture: sf0.001 with empty-text,
space-only, and tab/newline-edged documents appended. Running
check.py against it proves the engine-wide tokenization contract
(no empty tokens, ever) holds between Spark and every DuckDB oracle
on inputs the canonical testdata doesn't contain.

Expected failures when checking this fixture: q46_media_decode,
q77_frame_sample, and q101_bpe_encode only — their oracles are frozen
fixture tables (FIXTURES.md) keyed to the canonical 500 docs'
rows/vocabulary, so they cannot see injected rows (q101: the VT doc
introduces out-of-vocab tokens the frozen BPE table can't carry).
Every computational SQL oracle must be green.

Usage: python3 scripts/make_edge_fixture.py [srcdir] [dstdir]
       python3 scripts/check.py <dstdir> /tmp/v_edge
"""
import duckdb, os, shutil, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/edge_sf"
os.makedirs(dst, exist_ok=True)
for t in "region nation customer supplier part orders lineitem events embeddings".split():
    shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
con = duckdb.connect()
mx = con.execute(f"SELECT max(doc_id) FROM '{src}/documents.parquet'").fetchone()[0]
con.execute(f"""
COPY (
  SELECT doc_id, text, lang, source, n_chars FROM '{src}/documents.parquet'
  UNION ALL
  SELECT {mx}+1, '', lang, source, 0 FROM (SELECT * FROM '{src}/documents.parquet' LIMIT 1)
  UNION ALL
  SELECT {mx}+2, '   ', lang, source, 3 FROM (SELECT * FROM '{src}/documents.parquet' LIMIT 1)
  UNION ALL
  SELECT {mx}+3, E'\\t\\n ', lang, source, 3 FROM (SELECT * FROM '{src}/documents.parquet' LIMIT 1)
  UNION ALL
  -- \\x0B (vertical tab): Java's \\s includes it, RE2's does not — the
  -- engine's whitespace contract is the explicit class [ \\t\\n\\f\\r]
  -- (TextFns.WsClass), under which VT is a TOKEN character on both
  -- engines (round-10 advisor finding)
  SELECT {mx}+4, 'alpha ' || chr(11) || 'beta' || chr(11) || E' gamma\\fdelta', lang, source, 24 FROM (SELECT * FROM '{src}/documents.parquet' LIMIT 1)
) TO '{dst}/documents.parquet' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
print(f"edge fixture at {dst}: {n} documents (4 adversarial)")
