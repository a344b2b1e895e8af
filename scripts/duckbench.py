#!/usr/bin/env python3
"""Local DuckDB side of the like-for-like bench (SURVEY §9).

Times every oracle SQL from a Verify outDir's oracle_sql.json against the
same parquet tables Spark reads, min-of-2 like Bench, and prints a JSON
map.

The like-for-like "batch cut" is derived from the repo's tagged row list
(SparkEntry.benchTags, dumped by Verify as bench_tags.json next to
oracle_sql.json and embedded by Bench in bench_full.json) — NOT from name
prefixes. Rows tagged "e2e" (st*/x* machinery, k01's real CSV+ORC I/O) and
"contract" (ANN recall floors, d04's Hamming bound, g07's tolerance band)
are excluded: their oracle SQL restates the result, it is not equivalent
work.

Usage: python3 scripts/duckbench.py <sfDir> <oracle_sql.json> [spark_bench_full.json] [--skip-quadratic]

--skip-quadratic (VERDICT r10 item 5): skip rows whose ORACLE is
deliberately brute-force (oracle_cost=quadratic in SparkEntry.oracleCost,
dumped by Verify as oracle_cost.json / embedded by Bench) — at stress SFs
(sf0.3+) those oracles cost 10-60 s EACH and time the oracle's own
quadratic construction, not equivalent work. Skipped rows are listed in
"excluded_quadratic"; use the flag for ratio artifacts above sf0.1, never
for correctness runs.
"""
import json, os, sys, time
import duckdb

skip_quadratic = "--skip-quadratic" in sys.argv
argv = [a for a in sys.argv if a != "--skip-quadratic"]
sfdir, oracle_path = argv[1], argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
con.sql("SET threads TO 32")
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(oracle_path))

# Tag resolution order: bench_full.json (arg 3, written by Bench) →
# bench_tags.json beside the oracle file (written by Verify) → prefix
# fallback (pre-round-7 artifacts only).
tags = {}
if len(argv) > 3:
    try:
        tags = json.load(open(argv[3])).get("tags", {})
    except Exception:
        pass
if not tags:
    side = os.path.join(os.path.dirname(oracle_path), "bench_tags.json")
    if os.path.exists(side):
        tags = json.load(open(side))
if not tags:
    print("WARN: no bench_tags.json found; falling back to prefix heuristic",
          file=sys.stderr)
    tags = {k: ("e2e" if k.startswith(("st", "x")) else "batch")
            for k in oracle}

# Oracle cost classes: bench_full.json (arg 3) → oracle_cost.json beside
# the oracle file → empty (old artifacts: nothing skipped).
cost = {}
if len(argv) > 3:
    try:
        cost = json.load(open(argv[3])).get("oracle_cost", {})
    except Exception:
        pass
if not cost:
    side = os.path.join(os.path.dirname(oracle_path), "oracle_cost.json")
    if os.path.exists(side):
        cost = json.load(open(side))
skipped = sorted(k for k in oracle
                 if skip_quadratic and cost.get(k) == "quadratic")

times = {}
for name, sql in sorted(oracle.items()):
    if name in skipped:
        continue
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
         if v is not None and tags.get(k, "batch") == "batch"}
excluded = sorted(k for k in times if tags.get(k, "batch") != "batch")
out = {"sf": sfdir, "total_all": round(sum(v for v in times.values() if v), 3),
       "total_batch_cut": round(sum(batch.values()), 3),
       "n_batch_cut": len(batch), "excluded": excluded,
       "excluded_quadratic": skipped, "queries": times}
print(json.dumps(out, indent=1))

if len(argv) > 3:
    sb = json.load(open(argv[3]))["queries"]
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
