#!/usr/bin/env python3
"""Non-ASCII cross-engine parity sweep (VERDICT r12 item 3).

t28's langmix run proved regex/codepoint/byte parity beyond ASCII for ONE
row; every other documents-reading row (t01-t27, the d-family shinglers,
the p-curation funnels) runs the same NormSql/ToksSql fragments but had
only ASCII-corpus oracle evidence. This sweep runs the FULL Verify +
DuckDB selfcheck over the multi-script langmix corpus (CJK / Cyrillic /
Greek / Devanagari documents; every other table a copy of sf0.001, so the
whole 242-row surface executes) and records the per-row verdicts as an
artifact. Rows whose oracle SQL reads `documents` are the rows the sweep
is ABOUT — their green means the Spark and DuckDB normalizer/tokenizer/
shingler agree off ASCII; everything else is a free regression check.

Usage (three steps — sbt first, then this script):
  python3 scripts/gen_langmix.py tmp/langmix
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify tmp/langmix tmp/langmix_verify"
  python3 scripts/langmix_parity.py tmp/langmix tmp/langmix_verify tmp/langmix_parity.json
"""
import json
import os
import re
import subprocess
import sys

corpus = sys.argv[1] if len(sys.argv) > 1 else "tmp/langmix"
verify_out = sys.argv[2] if len(sys.argv) > 2 else "tmp/langmix_verify"
artifact = sys.argv[3] if len(sys.argv) > 3 else "tmp/langmix_parity.json"

if not os.path.exists(f"{corpus}/documents.parquet"):
    sys.exit(f"{corpus} missing — run: python3 scripts/gen_langmix.py {corpus}")
if not os.path.exists(f"{verify_out}/oracle_sql.json"):
    sys.exit(f"{verify_out} missing — run: sbt \"runMain graft.Verify "
             f"{corpus} {verify_out}\"")

# the selfcheck IS the driver-replica compare; reuse it verbatim
proc = subprocess.run(
    [sys.executable, "scripts/selfcheck.py", corpus, verify_out],
    capture_output=True, text=True)
results, fails = {}, []
for line in proc.stdout.splitlines():
    m = re.match(r"(PASS|FAIL|ERROR) ([^\s:]+):?\s?(.*)", line)
    if not m:
        continue
    verdict, name, detail = m.groups()
    results[name] = "pass" if verdict == "PASS" else "fail"
    if verdict != "PASS":
        fails.append({"query": name, "detail": detail[:400]})

# A selfcheck that crashed outright (missing duckdb, import error, bad
# args) leaves results empty and would read as '0 pass / 0 fail' all-green
# (ADVICE r13). The sweep's whole point is the compare RUNNING — fail
# loudly instead of writing a vacuous artifact. rc=1 with parsed FAIL
# lines is the legitimate "some rows failed" path and falls through.
if proc.returncode != 0 and not results:
    sys.exit(f"selfcheck.py crashed (rc={proc.returncode}) with no parsed "
             f"verdicts — stderr:\n{proc.stderr[-2000:]}")
if not results:
    sys.exit("selfcheck.py produced zero PASS/FAIL verdicts — the parity "
             "sweep did not actually run; refusing to write an all-green "
             f"artifact. stdout tail:\n{proc.stdout[-1000:]}")

# the sweep's subject: rows whose ORACLE reads documents (the repo
# discipline makes the oracle restate the same tables as the Spark side);
# contract rows whose oracle is constants but whose pipeline reads
# documents are listed explicitly.
oracle_sql = json.load(open(f"{verify_out}/oracle_sql.json"))
CONTRACT_DOC_READERS = {"d04_simhash"}
doc_rows = sorted(
    q for q, sql in oracle_sql.items()
    if re.search(r"\bdocuments\b", sql, re.IGNORECASE)
    or q in CONTRACT_DOC_READERS)

summary = {
    "corpus": corpus,
    "generator": "scripts/gen_langmix.py (CJK/Cyrillic/Greek/Devanagari, seed 12)",
    "n_queries": len(results),
    "n_pass": sum(1 for v in results.values() if v == "pass"),
    "n_fail": len(fails),
    "documents_rows": doc_rows,
    "documents_rows_fail": [f["query"] for f in fails if f["query"] in doc_rows],
    "fails": fails,
    "results": results,
}
json.dump(summary, open(artifact, "w"), indent=1)
print(f"{summary['n_pass']} pass / {summary['n_fail']} fail "
      f"({len(doc_rows)} documents-reading rows, "
      f"{len(summary['documents_rows_fail'])} of them failing)")
print(f"wrote {artifact}")
sys.exit(1 if fails else 0)
