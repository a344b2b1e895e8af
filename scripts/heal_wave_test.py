#!/usr/bin/env python3
"""Live validation of heal waves 2 (cpu) and 3 (wall) — VERDICT r13 item 7
plus the round-14 wall lever, the way wave 1 was validated by the spinner
test: a real bench run against a DOCTORED baseline must (a) enter the
baseline-keyed waves for exactly the doctored rows, (b) never accept a
retime that fails the per-row baseline check (the ADVICE r13 laundering
hole), and (c) ship `contaminated: true` with those rows in `unhealed`.

Method: symlink sf0.001 under a scratch name so the bench reads a scratch
baseline TSV; run once clean (no TSV — sentinel DISARMED, artifact clean);
refresh the TSV from that artifact; deflate 6 top-cpu rows' cpu 5x (wave-2
bait: run cpu > 3x base at base >= 1.0) and 3 disjoint rows' wall 5x
(wave-3 bait); re-run. Because the baseline is doctored, no retime can
ever clear the per-row check — the run must end contaminated with exactly
the 9 doctored rows unhealed, proving both the row selection and the
no-laundering rule on a live run.

Usage: python3 scripts/heal_wave_test.py        (from /root/repo)
Artifacts: tmp/heal_wave_clean.json, tmp/heal_wave_doctored.json,
           tmp/heal_wave_test_result.json
"""
import json
import os
import shutil
import subprocess
import sys

SRC = "/root/testdata/sf0.001"
LINK = "tmp/hw_sf0.001"
TSV = "scripts/bench_cpu_baseline_hw_sf0.001.tsv"
N_CPU_BAIT = 6
N_WALL_BAIT = 3


def run_bench(tag):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=LINK, SPARK_GRAFT_CPUS="32")
    proc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"], env=env,
        capture_output=True, text=True, timeout=3600)
    if not os.path.exists("bench_full.json"):
        sys.exit(f"[{tag}] bench produced no bench_full.json; tail:\n"
                 + proc.stdout[-3000:] + proc.stderr[-2000:])
    art = json.load(open("bench_full.json"))
    out = f"tmp/heal_wave_{tag}.json"
    shutil.copy("bench_full.json", out)
    print(f"[{tag}] total={art['value']}s contaminated={art['contaminated']} "
          f"retimed={len(art['sentinel']['retimed'])} "
          f"unhealed={len(art['sentinel']['unhealed'])} -> {out}")
    return art, proc.stderr


os.makedirs("tmp", exist_ok=True)
if os.path.islink(LINK):
    os.unlink(LINK)
os.symlink(SRC, LINK)
if os.path.exists(TSV):
    os.remove(TSV)

# --- pass 1: clean run, sentinel disarmed --------------------------------
clean, stderr1 = run_bench("clean")
if clean["contaminated"]:
    sys.exit("clean pass came back contaminated — rerun on an idle box")
if "DISARMED" not in stderr1:
    sys.exit("expected the DISARMED warning on the baseline-less clean pass")

# --- refresh the scratch TSV from the clean artifact ----------------------
subprocess.run([sys.executable, "scripts/refresh_cpu_baseline.py",
                "tmp/heal_wave_clean.json"], check=True)

# --- doctor: deflate cpu on the top-6 cpu rows, wall on 3 disjoint rows ---
rows = {}
for line in open(TSV):
    if line.startswith("#") or not line.strip():
        continue
    n, cpu, cg, wall = line.rstrip("\n").split("\t")
    rows[n] = [float(cpu), int(cg), float(wall)]
by_cpu = sorted(rows, key=lambda n: -rows[n][0])
cpu_bait = [n for n in by_cpu if rows[n][0] / 5.0 >= 1.0][:N_CPU_BAIT]
if len(cpu_bait) < N_CPU_BAIT:
    sys.exit(f"only {len(cpu_bait)} rows have cpu >= 5.0 at sf0.001 — "
             "cannot arm the >=5-row cpu lever")
wall_bait = [n for n in by_cpu
             if n not in cpu_bait and 1.0 <= rows[n][2] <= 3.0][:N_WALL_BAIT]
if len(wall_bait) < N_WALL_BAIT:
    sys.exit("not enough disjoint rows with wall in [1,3]s for the wave-3 bait")
for n in cpu_bait:
    rows[n][0] /= 5.0
for n in wall_bait:
    rows[n][2] /= 5.0
with open(TSV, "w") as f:
    f.write("# DOCTORED baseline for scripts/heal_wave_test.py — delete me\n")
    for n, (cpu, cg, wall) in sorted(rows.items(), key=lambda kv: -kv[1][0]):
        f.write(f"{n}\t{cpu:.3f}\t{cg}\t{wall:.3f}\n")
print(f"doctored cpu 5x on {cpu_bait}")
print(f"doctored wall 5x on {wall_bait}")

# --- pass 2: the doctored run ---------------------------------------------
art, stderr2 = run_bench("doctored")
s = art["sentinel"]
bait = set(cpu_bait) | set(wall_bait)
unhealed = set(s["unhealed"])
retimed = {r["query"] for r in s["retimed"]}
failures = []
if not art["contaminated"]:
    failures.append("doctored run shipped contaminated:false — the "
                    "laundering hole is OPEN")
if "still cpu-inflated" not in stderr2:
    failures.append("wave 2 was never entered")
if "wall-inflated" not in stderr2:
    failures.append("wave 3 was never entered")
if not s["cpu_inflated"]:
    failures.append("final verdict lost the cpu flag")
if not s.get("wall_inflated"):
    failures.append("final verdict lost the wall flag")
extra = unhealed - bait
missing = bait - unhealed
if missing:
    failures.append(f"doctored rows NOT in unhealed: {sorted(missing)}")
if extra:
    failures.append(f"non-doctored rows in unhealed (box not idle?): "
                    f"{sorted(extra)}")
laundered = retimed & bait
if laundered:
    failures.append(f"doctored rows ACCEPTED as retimed — per-row "
                    f"acceptance failed: {sorted(laundered)}")

result = {
    "cpu_bait": cpu_bait, "wall_bait": wall_bait,
    "unhealed": sorted(unhealed), "retimed": sorted(retimed),
    "contaminated": art["contaminated"],
    "cpu_inflated_n": s["cpu_inflated_n"],
    "wall_inflated_n": s.get("wall_inflated_n"),
    "failures": failures,
}
json.dump(result, open("tmp/heal_wave_test_result.json", "w"), indent=1)
os.remove(TSV)  # the doctored TSV must not leak into real runs
os.unlink(LINK)
if failures:
    print("FAIL:\n  " + "\n  ".join(failures))
    sys.exit(1)
print("PASS: waves 2+3 selected exactly the doctored rows, no retime was "
      "laundered, and the run self-reported contaminated:true")
