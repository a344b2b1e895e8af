#!/usr/bin/env python3
"""Refresh scripts/bench_cpu_baseline_<sf>.tsv from CLEAN bench artifacts.

The TSV is the reference for graft.Bench's cpu-inflation sentinel lever;
its refresh rule (header comment) is: only from clean solo runs, min
cpu_sec per row over the artifacts, max codegen. This script enforces the
rule mechanically — a `contaminated: true` artifact is refused — and
RoundThirteenOpsSpec asserts the TSV covers EVERY SparkEntry query, so
adding a row without refreshing fails the build instead of silently
disarming the sentinel for that row.

Usage:
  python3 scripts/refresh_cpu_baseline.py <bench_full.json> [more.json ...]
"""
import json
import sys

arts = [json.load(open(p)) for p in sys.argv[1:]]
if not arts:
    sys.exit("usage: refresh_cpu_baseline.py <clean bench_full.json> [...]")
for p, a in zip(sys.argv[1:], arts):
    if a.get("contaminated"):
        sys.exit(f"{p} is contaminated:true — the baseline may only be "
                 "refreshed from clean solo runs")
sf = {a["sf"].rstrip("/").split("/")[-1] for a in arts}
if len(sf) != 1:
    sys.exit(f"artifacts span multiple SFs: {sf}")
sf = sf.pop()
path = f"scripts/bench_cpu_baseline_{sf}.tsv"

# keep the existing file's rows as one more source (mins accumulate
# across refreshes unless a row vanished from SparkEntry)
old = {}
try:
    for line in open(path):
        if line.startswith("#") or not line.strip():
            continue
        n, cpu, cg = line.rstrip("\n").split("\t")
        old[n] = (float(cpu), int(cg))
except FileNotFoundError:
    pass

live = set()
merged = {}
for a in arts:
    for q, p in a["provenance"].items():
        live.add(q)
        cpu, cg = p.get("cpu_sec", -1.0), p.get("codegen", -1)
        if cpu is None or cpu < 0:
            continue
        pc, pg = merged.get(q, (float("inf"), -1))
        merged[q] = (min(pc, cpu), max(pg, cg))
for q, (cpu, cg) in old.items():
    if q in live:  # rows dropped from SparkEntry fall out of the TSV
        pc, pg = merged.get(q, (float("inf"), -1))
        merged[q] = (min(pc, cpu), max(pg, cg))

header = """# Per-query clean-run cpu_sec baseline at %s: min over the clean solo
# artifacts merged so far (refresh provenance in git history), covering
# every current SparkEntry row — RoundThirteenOpsSpec fails if a row is
# missing, so a new operator cannot silently disarm the sentinel.
# Consumed by graft.Bench's contamination sentinel: a run where >=5 rows
# with baseline cpu>=1.0 exceed 3x this cpu at unchanged codegen count
# self-reports contaminated (the BENCH_r11 incident: cpu 10x at identical
# codegen, load/PSI silent). Refresh ONLY from clean solo runs after an
# intentional plan change: python3 scripts/refresh_cpu_baseline.py
# <clean bench_full.json> [...]. Sorted by cpu desc.
""" % sf
with open(path, "w") as f:
    f.write(header)
    for q, (cpu, cg) in sorted(merged.items(), key=lambda kv: -kv[1][0]):
        f.write(f"{q}\t{cpu:.3f}\t{cg}\n")
print(f"wrote {path}: {len(merged)} rows from {len(arts)} artifact(s) + prior file")
