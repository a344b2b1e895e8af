#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>

For each <name>.parquet dir under verifyOutDir, runs the matching SQL from
oracle_sql.json in DuckDB (tables = parquet views over sfDir), sorts columns
by name on both sides, and compares row count, schema, and values.
"""
import json, sys, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.sql(sql).df()
        sdf = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        odf = odf[sorted(odf.columns)]
        sdf = sdf[sorted(sdf.columns)]
        status = []
        if list(odf.columns) != list(sdf.columns):
            status.append(f"cols spark={list(sdf.columns)} oracle={list(odf.columns)}")
        if len(odf) != len(sdf):
            status.append(f"rows spark={len(sdf)} oracle={len(odf)}")
        if not status:
            # dtype KIND drift is what the driver's value-hash actually
            # trips on (HUGEINT->object/float, DOUBLE vs BIGINT) even when
            # values match; int width (int32 vs int64) provably does not
            # (q10/q19/s01/t01... were all hash-green in r02 with int32).
            for c in odf.columns:
                if sdf[c].dtype.kind != odf[c].dtype.kind:
                    status.append(
                        f"dtype {c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
        if not status:
            for c in odf.columns:
                a, b = sdf[c].tolist(), odf[c].tolist()
                for i, (x, y) in enumerate(zip(a, b)):
                    # pd.isna covers None, NaN, AND NaT — pandas nulls on
                    # both sides serialize identically in the driver's
                    # value hash, so they compare equal here too
                    try:
                        both_na = bool(pd.isna(x)) and bool(pd.isna(y))
                    except (TypeError, ValueError):
                        both_na = False  # pd.isna on arrays returns arrays
                    same = both_na or (x == y) or (x is None and y is None)
                    if not same:
                        try:
                            same = (isinstance(x, float) or isinstance(y, float)) and \
                                   (math.isnan(x) and math.isnan(y) or
                                    abs(float(x) - float(y)) < 1e-9)
                        except Exception:
                            same = str(x) == str(y)
                    if not same:
                        status.append(f"col {c} row {i}: spark={x!r} oracle={y!r}")
                        break
                if status:
                    break
        if status:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sdf)} rows)")
    except Exception as e:
        n_fail += 1
        print(f"ERROR {name}: {e}")
print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
