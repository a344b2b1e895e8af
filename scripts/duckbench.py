#!/usr/bin/env python3
"""Local DuckDB side of the like-for-like bench (SURVEY §9).

Times every oracle SQL from a Verify outDir's oracle_sql.json against the
same parquet tables Spark reads, min-of-2 like Bench, and prints a JSON
map. The st*/x* rows run checkpointed streaming / orchestration machinery
on the Spark side, so the like-for-like cut excludes them (the oracle SQL
is a batch restatement, not equivalent work).

Usage: python3 scripts/duckbench.py <sfDir> <oracle_sql.json> [spark_bench_full.json]
"""
import json, sys, time
import duckdb

sfdir, oracle_path = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.sql("SET threads TO 32")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
times = {}
for name, sql in sorted(oracle.items()):
    try:
        def once():
            t0 = time.time()
            con.sql(sql).fetchall()
            return time.time() - t0
        times[name] = round(min(once(), once()), 3)
    except Exception as e:
        times[name] = None
        print(f"ERR {name}: {e}", file=sys.stderr)

batch = {k: v for k, v in times.items()
         if v is not None and not (k.startswith("st") or k.startswith("x"))}
out = {"sf": sfdir, "total_all": round(sum(v for v in times.values() if v), 3),
       "total_batch_cut": round(sum(batch.values()), 3),
       "n_batch_cut": len(batch), "queries": times}
print(json.dumps(out, indent=1))

if len(sys.argv) > 3:
    sb = json.load(open(sys.argv[3]))["queries"]
    rows = []
    for k, v in batch.items():
        if k in sb:
            rows.append((sb[k] / max(v, 1e-4), k, sb[k], v))
    rows.sort(reverse=True)
    spark_sum = sum(r[2] for r in rows)
    duck_sum = sum(r[3] for r in rows)
    print(f"\nBATCH CUT ({len(rows)} queries): spark={spark_sum:.1f}s "
          f"duckdb={duck_sum:.1f}s ratio={spark_sum/duck_sum:.2f}x")
    for ratio, k, s, d in rows[:25]:
        print(f"  {ratio:7.1f}x  {k:28s} spark={s:7.3f} duck={d:7.3f}")
