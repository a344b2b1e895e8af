#!/usr/bin/env python3
"""Live validation that the g23-class contention (wall stretched by IO
pressure, cpu levers silent) is now VISIBLE and HEALS — the round-14
counterpart of r13's 16-thread-spinner test for cpu contention.

Runs a real sf0.001 bench and injects a disk hammer (8 parallel dd+fsync
writers, ~75 s) mid-run. Measured on this box, that pushes io-some avg10
past 40 (the InRunIoPsiBar) within ~15 s while 1-min load stays far under
the 24 bar — exactly the contention class BENCH_r13 shipped under
`contaminated: false`. The run must (a) see it: inrun_max_psi_io10 over
the bar (or another bar tripped), quarantined_n > 0; (b) heal it: bars
clear after the hammer stops, quarantined rows retimed clean, unhealed
empty; (c) ship `contaminated: false` WITH `retimed` provenance.

Usage: python3 scripts/wall_contention_test.py     (from /root/repo, idle box)
Artifact: tmp/wall_contention_test.json (the bench artifact of the run)
"""
import json
import os
import shutil
import subprocess
import sys
import threading
import time

HAMMER_DELAY_S = 90
HAMMER_SECONDS = 75
HAMMER_WRITERS = 8


def hammer():
    time.sleep(HAMMER_DELAY_S)
    print(f"[hammer] starting {HAMMER_WRITERS} dd+fsync writers for "
          f"{HAMMER_SECONDS}s", flush=True)
    stop = time.time() + HAMMER_SECONDS
    while time.time() < stop:
        procs = [subprocess.Popen(
            ["dd", "if=/dev/zero", f"of=tmp/hammer_{i}", "bs=1M",
             "count=1200", "conv=fsync"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            for i in range(HAMMER_WRITERS)]
        for p in procs:
            p.wait()
    for i in range(HAMMER_WRITERS):
        try:
            os.remove(f"tmp/hammer_{i}")
        except FileNotFoundError:
            pass
    print("[hammer] stopped", flush=True)


os.makedirs("tmp", exist_ok=True)
t = threading.Thread(target=hammer, daemon=True)
t.start()
env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
           SPARK_GRAFT_CPUS="32")
proc = subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                      capture_output=True, text=True, timeout=3600)
if not os.path.exists("bench_full.json"):
    sys.exit("bench produced no artifact; tail:\n" + proc.stdout[-3000:])
art = json.load(open("bench_full.json"))
shutil.copy("bench_full.json", "tmp/wall_contention_test.json")
s = art["sentinel"]
print(f"total={art['value']}s contaminated={art['contaminated']} "
      f"quarantined={s['quarantined_n']} retimed={len(s['retimed'])} "
      f"unhealed={len(s['unhealed'])} max_psi_io={s.get('inrun_max_psi_io10')} "
      f"max_load1={s['inrun_max_load1']} max_foreign={s['inrun_max_foreign_cpu']}")
failures = []
if s["quarantined_n"] == 0:
    failures.append("the hammer window quarantined nothing — the io "
                    "contention class is still invisible")
if float(s.get("inrun_max_psi_io10", -1)) <= 40.0 and \
        float(s["inrun_max_load1"]) <= 24.0 and \
        float(s["inrun_max_foreign_cpu"]) <= 0.25 and \
        float(s["inrun_max_psi10"]) <= 10.0:
    failures.append("no bar actually crossed — hammer too weak, rerun")
if s["unhealed"]:
    failures.append(f"unhealed rows remain: {s['unhealed']}")
if art["contaminated"]:
    failures.append("run shipped contaminated:true — heal did not complete")
if not s["retimed"]:
    failures.append("nothing was retimed — quarantine without heal")
json.dump({"failures": failures, "sentinel_summary": {
    "quarantined_n": s["quarantined_n"], "retimed_n": len(s["retimed"]),
    "unhealed_n": len(s["unhealed"]),
    "max_psi_io": s.get("inrun_max_psi_io10")}},
    open("tmp/wall_contention_result.json", "w"), indent=1)
if failures:
    print("FAIL:\n  " + "\n  ".join(failures))
    sys.exit(1)
print("PASS: io-pressure contention was seen at the boundaries, the "
      "bracketed rows were retimed clean, and the artifact ships "
      "contaminated:false with retimed provenance")
