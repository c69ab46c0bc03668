#!/usr/bin/env python
"""Growth study for the round-6 global_rank-consumer study (VERDICT r05 item #7): 1x vs 4x data after the CJK codepoint surrogate rewrite.

er_sorted_neighborhood / feat_quantile_normalize — the two global_rank
consumers (rank phase must stay multi-task with the new codepoint
surrogate); stat_ks_two_sample — the prefix-sum family twin (now
checkpointed). Same protocol as bench/r04_growth_bench.py (whose
replicate() this reuses): pinned local[8], noop-write sink, best-of-2
per (op, scale), fact tables replicated with key shifts, dims static.

Run pinned at loadavg < ~4, nothing else on Spark:
    taskset -c 0-7 env PYTHONPATH=src python bench/r06_growth_bench.py
Writes BENCH/r06_growth.json.
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
    "er_sorted_neighborhood", "feat_quantile_normalize",
    "stat_ks_two_sample",
    # round-6 restructured ops: growth must stay linear-ish after the
    # single-pass/checkpoint/threshold rewrites
    "search_bm25_topk", "decontaminate_fuzzy", "dedup_kgram_exact",
    "dedup_edit_scanner", "assoc_pairs_support", "heavy_hitters_mg",
    "emb_jl_projection",
]

STATIC_TABLES = ("region", "nation", "customer", "supplier", "part")


def main() -> None:
    from ocrflow.session import build_session
    import ocrflow.dataops  # noqa: F401
    from ocrflow.queries import QUERIES
    from r04_growth_bench import replicate

    spark = build_session(master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {"sf_dir": SF_DIR, "loadavg": os.getloadavg(),
                     "protocol": "pinned local[8], noop sink, best-of-2, "
                                 "facts replicated (dims static)",
                     "ops": {}}
    scratch = "/tmp/ocrflow_r06_scale"
    dirs = {}
    for k in (1, 4):
        out = os.path.join(scratch, f"x{k}")
        replicate(spark, SF_DIR, k, out)
        for name in STATIC_TABLES:
            src = f"{SF_DIR}/{name}.parquet"
            dst = os.path.join(out, f"{name}.parquet")
            if not os.path.exists(dst):
                if os.path.isdir(src):
                    shutil.copytree(src, dst)
                else:
                    shutil.copy2(src, dst)
        dirs[k] = out

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    for op in OPS:                        # warmup: JIT + python workers
        sink(QUERIES[op](spark, dirs[1]))

    for op in OPS:
        fn = QUERIES[op]
        walls, rows = {}, {}
        for k in (1, 4):
            rows[k] = fn(spark, dirs[k]).count()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                sink(fn(spark, dirs[k]))
                best = min(best, time.perf_counter() - t0)
            walls[k] = round(best, 2)
        growth = round(walls[4] / walls[1], 2) if walls[1] > 0 else None
        results["ops"][op] = {"wall_1x_s": walls[1], "wall_4x_s": walls[4],
                              "rows_1x": rows[1], "rows_4x": rows[4],
                              "wall_growth_4x": growth}
        print(op, results["ops"][op], flush=True)

    out = os.path.join(REPO, "BENCH", "r06_growth.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
