#!/usr/bin/env python
"""Growth study for the round-6 CONTINUATION-pass ops: 1x vs 4x data
after the CC round cuts (probe-every-round + double pointer jump), the
quality-gate pushdown barrier, and the q21 SHUFFLE_HASH pin.

dedup_materialize — CC consumer (rounds now ~log4 of chain depth);
corpus_curation_e2e — gate regexes pinned post-exchange;
emb_quantize_int8 — scale expr pinned post-exchange;
tpch_q21_shape — semi/anti legs pinned shuffled-hash.

Same protocol as bench/r04_growth_bench.py (whose replicate() this
reuses): pinned local[8], noop-write sink, best-of-2 per (op, scale),
fact tables replicated 4x with key shifts, dims static.

Run pinned at loadavg < ~4, nothing else on Spark:
    taskset -c 0-7 env PYTHONPATH=src python bench/r06b_growth_bench.py
Writes BENCH/r06b_growth.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

OPS = [
    "dedup_materialize", "corpus_curation_e2e", "emb_quantize_int8",
    "tpch_q21_shape",
]


def main() -> None:
    from ocrflow.session import build_session
    import ocrflow.dataops  # noqa: F401
    from ocrflow.queries import QUERIES
    from r04_growth_bench import replicate

    spark = build_session(master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    x4 = "/tmp/ocrflow_r06b_x4"
    if os.path.isdir(x4):
        shutil.rmtree(x4)
    replicate(spark, SF_DIR, 4, x4)
    # r04's replicate() scales the fact tables only; q21 also reads
    # supplier — link the static dims in (dims don't grow in the
    # protocol, same as bench/join_scale_bench.py)
    for tbl in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(x4, f"{tbl}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, f"{tbl}.parquet"), dst)

    out = {"protocol": "local[8] pinned, best-of-2 noop-write",
           "loadavg_start": os.getloadavg(), "ops": {}}
    for op in OPS:
        fn = QUERIES[op]
        row = {}
        for label, d in (("x1", SF_DIR), ("x4", x4)):
            best = float("inf")
            for _ in range(2):
                spark.sparkContext.setJobDescription(f"r06b:{op}:{label}")
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 3)
        row["ratio"] = round(row["x4"] / row["x1"], 2)
        out["ops"][op] = row
        print(op, row, flush=True)
    out["loadavg_end"] = os.getloadavg()

    with open(os.path.join(REPO, "BENCH", "r06b_growth.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
