#!/usr/bin/env python3
"""Refresh scripts/bench_cpu_baseline_<sf>.tsv from CLEAN bench artifacts.

The TSV is the reference for graft.Bench's two baseline sentinel levers
(cpu-inflation and wall-inflation); its refresh rule (header comment) is:
only from clean solo runs, min cpu_sec / min wall per row over the
artifacts, max codegen. This script enforces the rule mechanically — a
`contaminated: true` artifact is refused — and RoundThirteenOpsSpec
asserts the TSV covers EVERY SparkEntry query, so adding a row without
refreshing fails the build instead of silently disarming the sentinel
for that row.

Two ADVICE r13 rules:
 - rows whose source artifacts carry NO valid codegen reading are
   skipped with a warning instead of written as cg=-1 (a -1 in the TSV
   silently disarms the cpu lever's codegen gate for exactly that row);
 - --reset drops the prior TSV's min-merge so an INTENTIONAL plan change
   that legitimately slowed a query gets a fresh baseline (the default
   min-merge can only ever ratchet down, which would eventually make
   clean solo runs self-flag against a stale faster min);
 - --reset-row <name> is the surgical form: drop the prior min for that
   row alone (repeatable), keeping every other row's accumulated history.

Usage:
  python3 scripts/refresh_cpu_baseline.py [--reset] [--reset-row q ...] \\
      <bench_full.json> [more.json ...]
"""
import json
import sys

args = sys.argv[1:]
reset = "--reset" in args
reset_rows = set()
i = 0
while i < len(args):
    if args[i] == "--reset-row":
        if i + 1 >= len(args):
            sys.exit("--reset-row needs a query name")
        reset_rows.add(args[i + 1])
        del args[i:i + 2]
    else:
        i += 1
paths = [p for p in args if p != "--reset"]
arts = [json.load(open(p)) for p in paths]
if not arts:
    sys.exit("usage: refresh_cpu_baseline.py [--reset] <clean bench_full.json> [...]")
for p, a in zip(paths, arts):
    if a.get("contaminated"):
        sys.exit(f"{p} is contaminated:true — the baseline may only be "
                 "refreshed from clean solo runs")
sf = {a["sf"].rstrip("/").split("/")[-1] for a in arts}
if len(sf) != 1:
    sys.exit(f"artifacts span multiple SFs: {sf}")
sf = sf.pop()
path = f"scripts/bench_cpu_baseline_{sf}.tsv"

# keep the existing file's rows as one more source (mins accumulate
# across refreshes unless a row vanished from SparkEntry) — unless
# --reset, which takes the new artifacts' values alone
old = {}
if not reset:
    try:
        for line in open(path):
            if line.startswith("#") or not line.strip():
                continue
            parts = line.rstrip("\n").split("\t")
            n, cpu, cg = parts[0], parts[1], parts[2]
            if n in reset_rows:
                continue
            wall = float(parts[3]) if len(parts) > 3 else float("inf")
            old[n] = (float(cpu), int(cg), wall)
    except FileNotFoundError:
        pass

live = set()
merged = {}
skipped_no_cg = []
for a in arts:
    walls = a.get("queries", {})
    for q, p in a["provenance"].items():
        live.add(q)
        cpu, cg = p.get("cpu_sec", -1.0), p.get("codegen", -1)
        wall = walls.get(q, float("inf"))
        if cpu is None or cpu < 0:
            continue
        if cg is None or cg < 0:
            # a -1 codegen written to the TSV would make the cpu lever's
            # `cg <= baseCg + slack` gate never match — skip instead
            skipped_no_cg.append(q)
            continue
        pc, pg, pw = merged.get(q, (float("inf"), -1, float("inf")))
        merged[q] = (min(pc, cpu), max(pg, cg), min(pw, wall))
for q, (cpu, cg, wall) in old.items():
    if q in live:  # rows dropped from SparkEntry fall out of the TSV
        pc, pg, pw = merged.get(q, (float("inf"), -1, float("inf")))
        merged[q] = (min(pc, cpu), max(pg, cg), min(pw, wall))

really_skipped = sorted(set(skipped_no_cg) - set(merged))
if really_skipped:
    print(f"WARNING: {len(really_skipped)} rows had no valid codegen reading "
          f"in any source and were NOT written: {really_skipped[:5]} — the "
          "sentinel is disarmed for them until a clean artifact carries "
          "codegen", file=sys.stderr)

header = """# Per-query clean-run baseline at %s: min cpu_sec / min wall_sec over
# the clean solo artifacts merged so far (refresh provenance in git
# history), max codegen; covering every current SparkEntry row —
# RoundThirteenOpsSpec fails if a row is missing, so a new operator
# cannot silently disarm the sentinel.
# Consumed by graft.Bench's contamination sentinel: a run where >=5 rows
# with baseline cpu>=1.0 exceed 3x this cpu at unchanged codegen count
# self-reports contaminated (the BENCH_r11 incident), and any row whose
# wall reads >=1.0s AND >3x this wall at unchanged codegen is retimed by
# heal wave 3 / flags if unhealed (the BENCH_r13 g23 incident: wall 9.89s
# vs 0.27s clean with cpu and load/PSI silent). Clean-vs-clean
# calibration over the four r13 solo artifacts: max wall ratio 1.99x,
# zero rows over 2x at run wall >= 1s — 3x separates jitter from the
# 15-30x incident class. Refresh ONLY from clean solo runs:
#   python3 scripts/refresh_cpu_baseline.py <clean bench_full.json> [...]
# After an INTENTIONAL plan change add --reset (drops the stale min).
# Columns: name<TAB>cpu_sec<TAB>codegen<TAB>wall_sec. Sorted by cpu desc.
""" % sf
with open(path, "w") as f:
    f.write(header)
    for q, (cpu, cg, wall) in sorted(merged.items(), key=lambda kv: -kv[1][0]):
        w = f"{wall:.3f}" if wall != float("inf") else "-1"
        f.write(f"{q}\t{cpu:.3f}\t{cg}\t{w}\n")
print(f"wrote {path}: {len(merged)} rows from {len(arts)} artifact(s)"
      + ("" if reset else " + prior file") + (" [RESET]" if reset else ""))
