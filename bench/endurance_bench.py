#!/usr/bin/env python
"""10M-turn production endurance run (round-4 VERDICT item 4).

The 100×-readiness proof for the FLAGSHIP path — not the sf0.1 suite:
run_extract (scan → salted repartition → Arrow kernel → icelite commit
+ lineage) over a 10×-larger-than-r03 synthetic corpus on pinned
8 cores, in commit-granular waves, with a REAL kill -9 mid-wave and a
resume to completion, then icelite compaction. Asserts exactly-once
output (count == distinct(conv,turn) == n_turns), byte-equality on a
sample vs the reference kernel, and a task-wall histogram with
max ≤ 2× mean (skew bound). Writes BENCH/endurance_10m.json.

File count scales with data (default 80 files = 10 waves of 8 cores —
the r03 lesson: scan parallelism caps at the file count, so a 10×
corpus needs 10× the files, not 10× the bytes per file).

Usage:
    PYTHONPATH=src python bench/endurance_bench.py --turns 10000000
    (start only at loadavg < ~1.5; generation is unpinned/whole-machine,
     the timed phases are taskset-pinned fresh JVMs on cores 0-7)
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "src")
sys.path.insert(0, SRC)

CORES = 8
CPU_LIST = f"0-{CORES - 1}"


def _phase_code(workdir: str, max_files: int | None, run_tag: str) -> str:
    """Driver code for one pinned fresh-JVM wave loop: keep invoking
    run_extract(max_files=...) until a wave processes 0 files."""
    return f"""
import json, sys, time
sys.path.insert(0, {SRC!r})
from ocrflow.session import build_session
from ocrflow.runner import run_extract
spark = build_session(master="local[{CORES}]", app="ocrflow-endurance",
                      shuffle_partitions={CORES})
spark.sparkContext.setLogLevel("ERROR")
inp = {workdir!r} + "/input"
out = {workdir!r} + "/extracted"
t0 = time.perf_counter()
waves = []
w = 0
while True:
    r = run_extract(spark, inp, out, run_id="{run_tag}-w%d" % w,
                    partitions={4 * CORES}, max_files={max_files!r})
    waves.append({{"files": r["files_processed"], "rows": r["rows_out"],
                   "wall_s": r.get("wall_s")}})
    print("WAVE", w, json.dumps(waves[-1]), flush=True)
    if r["files_processed"] == 0:
        break
    w += 1
print(json.dumps({{"phase_wall_s": round(time.perf_counter() - t0, 3),
                   "waves": waves}}), flush=True)
spark.stop()
"""


def run_pinned(code: str, kill_after: float | None = None) -> dict:
    env = dict(os.environ, PYTHONPATH=SRC)
    p = subprocess.Popen(["taskset", "-c", CPU_LIST, sys.executable, "-c",
                          code], stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, text=True, env=env)
    if kill_after is not None:
        t0 = time.time()
        lines = []
        # read incrementally so we can kill mid-wave
        while time.time() - t0 < kill_after:
            if p.poll() is not None:
                break
            time.sleep(1.0)
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)      # the crash: no cleanup
            p.wait()
            return {"killed": True, "after_s": round(time.time() - t0, 1)}
        out = p.stdout.read()
    else:
        out = p.communicate()[0]
    last = [ln for ln in out.splitlines() if ln.startswith("{")]
    return json.loads(last[-1]) if last else {"raw": out[-500:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=10_000_000)
    ap.add_argument("--files", type=int, default=80)
    ap.add_argument("--wave-files", type=int, default=10)
    ap.add_argument("--kill-after", type=float, default=90.0)
    ap.add_argument("--workdir", default="/tmp/ocrflow_endurance")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH",
                                                  "endurance_10m.json"))
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    report: dict = {"turns": args.turns, "files": args.files,
                    "cores": CORES, "wave_files": args.wave_files,
                    "loadavg_at_start": os.getloadavg()}

    inp = os.path.join(args.workdir, "input")
    if not os.path.exists(inp):
        print("generating corpus (unpinned, whole machine)...", flush=True)
        t0 = time.perf_counter()
        gen = f"""
import sys
sys.path.insert(0, {SRC!r})
from ocrflow.session import build_session
from ocrflow.synth import synth_dataframe
spark = build_session(master="local[32]", app="ocrflow-gen")
spark.sparkContext.setLogLevel("ERROR")
df = synth_dataframe(spark, {args.turns}, seed=42, partitions={args.files})
df.write.mode("overwrite").parquet({inp!r})
spark.stop()
"""
        subprocess.run([sys.executable, "-c", gen], check=True,
                       env=dict(os.environ, PYTHONPATH=SRC))
        report["gen_wall_s"] = round(time.perf_counter() - t0, 1)
        print(f"generated in {report['gen_wall_s']}s", flush=True)

    # phase 1: first waves, clean completion of a partial pass
    n_phase1_waves = (args.files // args.wave_files) // 2
    code1 = _phase_code(args.workdir, args.wave_files, "p1").replace(
        'if r["files_processed"] == 0:',
        f'if r["files_processed"] == 0 or w >= {n_phase1_waves - 1}:')
    t0 = time.perf_counter()
    report["phase1"] = run_pinned(code1)
    report["phase1"]["wall_s"] = round(time.perf_counter() - t0, 1)
    print("phase1:", json.dumps(report["phase1"])[:300], flush=True)

    # phase 2: continue, then kill -9 mid-wave (the crash)
    t0 = time.perf_counter()
    report["phase2"] = run_pinned(_phase_code(args.workdir, args.wave_files,
                                              "p2"),
                                  kill_after=args.kill_after)
    report["phase2"]["wall_s"] = round(time.perf_counter() - t0, 1)
    print("phase2 (killed):", json.dumps(report["phase2"]), flush=True)

    # phase 3: resume to completion
    t0 = time.perf_counter()
    report["phase3"] = run_pinned(_phase_code(args.workdir, args.wave_files,
                                              "p3"))
    report["phase3"]["wall_s"] = round(time.perf_counter() - t0, 1)
    print("phase3:", json.dumps(report["phase3"])[:300], flush=True)

    # verification + compaction (unpinned; correctness, not timing)
    verify = f"""
import json, sys, time
sys.path.insert(0, {SRC!r})
from ocrflow.session import build_session
from ocrflow.icelite import IceliteTable
from ocrflow import reference as R, synth
from pyspark.sql import functions as F
spark = build_session(master="local[32]", app="ocrflow-verify")
spark.sparkContext.setLogLevel("ERROR")
out = {args.workdir!r} + "/extracted"
tbl = IceliteTable(out)
df = tbl.read(spark)
n = df.count()
nd = df.select("conv_id", "turn_idx").distinct().count()
lin = IceliteTable(out + "/lineage").read(spark)
tasks = lin.filter("partition_id >= 0")
walls = sorted(r["wall_ms"] for r in tasks.select("wall_ms").collect())
rows_out = tasks.agg(F.sum("rows_out")).first()[0]
snaps = [s["snapshot_id"] for s in tbl.snapshots()]
# byte-equality sample vs the reference kernel
sample = df.filter(F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(997)) == 0)
bad = 0
for r in sample.collect()[:2000]:
    ci = int(r["conv_id"].rsplit("-", 1)[1])
    want = R.extract_turn(synth.gen_turn(ci, r["turn_idx"], 42)["text"],
                          role=synth.gen_turn(ci, r["turn_idx"], 42)["role"])
    if want.extracted_text != r["extracted_text"]:
        bad += 1
files_before = len(tbl.file_list())
t0 = time.perf_counter()
tbl.compact(spark, target_file_bytes=256 << 20)
compact_s = round(time.perf_counter() - t0, 1)
n_after = tbl.read(spark).count()
mean = sum(walls) / len(walls)
print(json.dumps({{
  "rows": n, "distinct": nd, "lineage_rows_out": rows_out,
  "snapshots": len(snaps),
  "task_ms": {{"n": len(walls), "mean": round(mean, 1),
              "p50": round(walls[len(walls)//2], 1),
              "max": round(walls[-1], 1),
              "max_over_mean": round(walls[-1] / mean, 2)}},
  "sample_checked": 2000, "sample_mismatch": bad,
  "files_before_compact": files_before,
  "files_after_compact": len(tbl.file_list()),
  "compact_s": compact_s, "rows_after_compact": n_after}}))
spark.stop()
"""
    v = subprocess.run([sys.executable, "-c", verify], check=True,
                       capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=SRC))
    last = [ln for ln in v.stdout.splitlines() if ln.startswith("{")]
    report["verify"] = json.loads(last[-1])

    productive_wall = (report["phase1"]["wall_s"] + report["phase3"]["wall_s"])
    report["throughput"] = {
        "productive_wall_s": round(productive_wall, 1),
        "crash_wasted_s": report["phase2"]["wall_s"],
        "turns_per_sec_productive": round(args.turns / productive_wall, 1),
        "turns_per_sec_incl_crash": round(
            args.turns / (productive_wall + report["phase2"]["wall_s"]), 1),
    }
    report["exactly_once"] = (
        report["verify"]["rows"] == args.turns
        and report["verify"]["distinct"] == args.turns
        and report["verify"]["rows_after_compact"] == args.turns
        and report["verify"]["sample_mismatch"] == 0)
    report["loadavg_at_end"] = os.getloadavg()
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps({"exactly_once": report["exactly_once"],
                      **report["throughput"],
                      "task_max_over_mean":
                          report["verify"]["task_ms"]["max_over_mean"]}))


if __name__ == "__main__":
    main()
