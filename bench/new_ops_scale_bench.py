#!/usr/bin/env python
"""Data-growth study for the round-3 late operator batch (same 1x-vs-4x
protocol as bench/join_scale_bench.py, whose replicate() builds the
key-shifted dirs). Linear-shaped ops should hold wall growth ≤~2.5x at
4x data on a fixed machine.

Interpretation notes (written before running; see BENCH/r03_notes.md
for measured results):
- graph_triangle_count: replicas shift l_orderkey but NOT l_suppkey, so
  the distinct edge set (and thus the wedge-close join) is CONSTANT
  across replicas — growth here measures the pair-generation scan +
  edge dedup, which is the dominant term at real scale too.
- pack_sequences_nextfit: parallelism is the shard count (documents'
  source column — constant under replication), so the per-group
  sequential pass grows ~linearly with data by design; the scale path
  (finer deterministic shard key) is documented in the op docstring.
- decontaminate_overlap: both the benchmark set and the corpus grow 4x
  (doc_id % 11 is replica-invariant), so the broadcast side grows too —
  the realistic regime is a FIXED eval suite over a growing corpus,
  which this bounds from above.

Run pinned-quiet only (loadavg < ~4):
    taskset -c 0-7 python bench/new_ops_scale_bench.py
Writes BENCH/new_ops_scaling.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OPS = [
    "skyline_pareto", "ts_ohlc", "win_share_of_total",
    "agg_regression", "agg_winsorized", "agg_bitwise",
    "graph_triangle_count",
    "text_repetition_filter", "decontaminate_overlap",
    "pack_sequences_nextfit",
]
# session-tail additions; run with OCRFLOW_OPS=tail to measure these
# (writes new_ops_scaling2.json)
OPS_TAIL = [
    "text_lm_score", "heavy_hitters_mg", "corpus_curation_e2e",
    "interval_merge", "ts_ewma", "win_rolling_median", "scd2_build",
    "join_point_in_time", "ts_time_weighted_avg", "win_autocorr",
    "event_transition_matrix", "win_cumulative_distinct",
]


def main() -> None:
    from ocrflow.session import build_session

    import ocrflow.dataops  # noqa: F401
    from ocrflow.queries import QUERIES
    from join_scale_bench import replicate

    spark = build_session(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    ops = OPS_TAIL if os.environ.get("OCRFLOW_OPS") == "tail" else OPS
    out_name = ("new_ops_scaling2.json"
                if os.environ.get("OCRFLOW_OPS") == "tail"
                else "new_ops_scaling.json")
    scratch = "/tmp/ocrflow_join_scale"   # shared with join_scale_bench
    dirs = {k: replicate(spark, SF_DIR, k, os.path.join(scratch, f"x{k}"))
            for k in (1, 4)}

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    for op in ops:                     # warmup (JIT + page cache)
        sink(QUERIES[op](spark, dirs[1]))

    results: dict = {"sf_dir": SF_DIR, "timing": "best_of_2_noop_write",
                     "ops": {}}
    for op in ops:
        fn = QUERIES[op]
        walls, rows = {}, {}
        for k in (1, 4):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                sink(fn(spark, dirs[k]))
                best = min(best, time.perf_counter() - t0)
            walls[k] = round(best, 2)
            rows[k] = fn(spark, dirs[k]).count()
        growth = round(walls[4] / walls[1], 2) if walls[1] > 0 else None
        results["ops"][op] = {"wall_1x_s": walls[1], "wall_4x_s": walls[4],
                              "rows_1x": rows[1], "rows_4x": rows[4],
                              "wall_growth_4x": growth}
        print(op, results["ops"][op], flush=True)

    out = os.path.join(REPO, "BENCH", out_name)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
