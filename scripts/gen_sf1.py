#!/usr/bin/env python3
"""~sf1 generation for the 10x scaling sweep (VERDICT r13 item 2).

gen_sf03.py's sibling at NCOPIES=10: stacks ten id-remapped copies of
sf0.1's documents/embeddings/events/lineitem. Copies carry the same
deterministic perturbations (copy-marker text suffix -> cross-copy
NEAR-duplicates, one-dimension vector nudge, deterministic microsecond
timestamp jitter so identical cross-copy timestamps don't fabricate
RANGE-frame peer groups — the r11 q46 lesson), so the planted near-dup /
hostile structures scale with the corpus instead of washing out.
Untouched dimension tables are copied from sf0.1.

Usage: python3 scripts/gen_sf1.py <outDir>       (e.g. tmp/sf1)
"""
import sys, shutil, os
import duckdb

SRC = "/root/testdata/sf0.1"
NCOPIES = 10
out = sys.argv[1]
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

def stack(table, sql_per_copy):
    parts = " UNION ALL ".join(sql_per_copy(k) for k in range(NCOPIES))
    con.sql(f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT parquet)")
    n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

stack("documents", lambda k: f"""
  SELECT doc_id + {k} * 100000000 AS doc_id,
         text || {"''" if k == 0 else f"' c{k}'"} AS text,
         lang, source,
         n_chars + {0 if k == 0 else 3} AS n_chars
  FROM '{SRC}/documents.parquet'""")

stack("embeddings", lambda k: f"""
  SELECT vec_id + {k} * 100000000 AS vec_id,
         CASE WHEN {k} = 0 THEN embedding
              ELSE list_transform(list_zip(embedding, range(len(embedding))),
                     x -> CAST(x[1] + CASE WHEN x[2] = 0 THEN 0.013 * {k} ELSE 0.0 END AS FLOAT))
         END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet'""")

stack("events", lambda k: f"""
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

stack("lineitem", lambda k: f"""
  SELECT * REPLACE (l_orderkey + {k} * 100000000 AS l_orderkey)
  FROM '{SRC}/lineitem.parquet'""")

for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
    print(f"{t}: copied from sf0.1")
