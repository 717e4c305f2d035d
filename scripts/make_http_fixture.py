#!/usr/bin/env python3
"""Expected-rows oracle for q199_http_ingest (S2/S3 HTTP ingest).

Independently replays the semantics of the reference's WP-REST ingest
(reference: src/ETL_PROPERTIES/providers/realhomes_provider.py:21-67
paging + _fields projection; providers/base_provider.py:111-174
modified_gmt delta skip with 60 s tolerance; per-record detail fetch
with fault isolation) over the SAME deterministic fixture universe the
in-process loopback server (graft.util.FixtureHttpApi) serves:

  - 50 listings, wp_id 1001..1050, 3 pages (20/20/10)
  - modified_gmt(id) = 2026-01-01T00:00:00 + (id-1000) * 60 s
  - known registry: id%3==0 -> last_updated = modified+30 s (within
    the 60 s tolerance => skipped), id%3==1 -> modified-300 s (stale
    => updated), id%3==2 -> unknown (new)
  - detail endpoint: price = (id%97)*1000 + (id%7)*50, bedrooms = id%5
  - injected faults: slug prop-1013 answers 500 on every attempt
    (=> error row, attempts = 3 with maxRetries=2), prop-1022 answers
    429 on its FIRST attempt only (=> success, attempts = 2)

Run from the repo root: python3 scripts/make_http_fixture.py
Writes fixtures/http_expected.parquet.
"""
import pyarrow as pa
import pyarrow.parquet as pq

rows = []
for wp_id in range(1001, 1051):
    slug = f"prop-{wp_id}"
    m = wp_id % 3
    if m == 0:
        rows.append((wp_id, slug, "skipped", None, None, 0, None))
    elif wp_id == 1013:  # permanent 500: error row, maxRetries=2 -> 3 attempts
        rows.append((wp_id, slug, "new", None, None, 3, "HTTP 500"))
    else:
        action = "updated" if m == 1 else "new"
        attempts = 2 if wp_id == 1022 else 1  # 1022: one 429 then success
        price = (wp_id % 97) * 1000 + (wp_id % 7) * 50
        rows.append((wp_id, slug, action, price, wp_id % 5, attempts, None))

cols = list(zip(*rows))
table = pa.table({
    "wp_id": pa.array(cols[0], pa.int64()),
    "slug": pa.array(cols[1], pa.string()),
    "action": pa.array(cols[2], pa.string()),
    "price": pa.array(cols[3], pa.int64()),
    "bedrooms": pa.array(cols[4], pa.int64()),
    "attempts": pa.array(cols[5], pa.int32()),
    "error": pa.array(cols[6], pa.string()),
})
pq.write_table(table, "fixtures/http_expected.parquet")
print(f"wrote fixtures/http_expected.parquet ({table.num_rows} rows)")
