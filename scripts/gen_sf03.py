#!/usr/bin/env python3
"""One-off ~sf0.3 generation for the approximate-operator fragility sweep.

Triples sf0.1's documents/embeddings/events/lineitem (the tables the
approximate family reads) by stacking three id-remapped copies; copies get
small deterministic perturbations so no cross-copy row is byte-identical
(text gets a copy marker suffix, vectors get a copy-dependent nudge on one
dimension) — cross-copy rows become NEAR-duplicates, which is exactly the
candidate-volume stress the sweep wants. Untouched tables are copied from
sf0.1 so the standard table views all resolve.

Usage: python3 scripts/gen_sf03.py <outDir>
"""
import sys, shutil, os
import duckdb

SRC = "/root/testdata/sf0.1"
out = sys.argv[1]
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

def triple(table, sql_per_copy):
    parts = " UNION ALL ".join(sql_per_copy(k) for k in range(3))
    con.sql(f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT parquet)")
    n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

triple("documents", lambda k: f"""
  SELECT doc_id + {k} * 100000000 AS doc_id,
         text || {"''" if k == 0 else f"' c{k}'"} AS text,
         lang, source,
         n_chars + {0 if k == 0 else 3} AS n_chars
  FROM '{SRC}/documents.parquet'""")

triple("embeddings", lambda k: f"""
  SELECT vec_id + {k} * 100000000 AS vec_id,
         CASE WHEN {k} = 0 THEN embedding
              ELSE list_transform(list_zip(embedding, range(len(embedding))),
                     x -> CAST(x[1] + CASE WHEN x[2] = 0 THEN 0.013 * {k} ELSE 0.0 END AS FLOAT))
         END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet'""")

# Copy timestamps get a deterministic ±1-999 µs jitter (k>0 only): identical
# cross-copy timestamps tripled every event-time RANGE-frame peer group BY
# CONSTRUCTION (q46's cpu_sec grew ~7.5x at sf0.3 from this fixture property
# alone — VERDICT r11), which no real event stream does. Jitter keeps the
# near-dup hostility (docs/embeddings untouched) but kills the artificial
# peer-group inflation. hash() is DuckDB's deterministic 64-bit hash.
triple("events", lambda k: f"""
  SELECT event_id + {k} * 100000000 AS event_id,
         CASE WHEN {k} = 0 THEN ts
              ELSE ts + to_microseconds(
                     (CAST(hash(event_id + {k}) % 999 AS BIGINT) + 1)
                     * (CASE WHEN hash(event_id * 7 + {k}) % 2 = 0
                        THEN 1 ELSE -1 END))
         END AS ts,
         user_id + {k} * 100000000 AS user_id,
         event_type, value, props
  FROM '{SRC}/events.parquet'""")

triple("lineitem", lambda k: f"""
  SELECT * REPLACE (l_orderkey + {k} * 100000000 AS l_orderkey)
  FROM '{SRC}/lineitem.parquet'""")

for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"{t}: copied from sf0.1")
