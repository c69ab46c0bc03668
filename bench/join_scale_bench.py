#!/usr/bin/env python
"""Join/window data-growth study (round-3 VERDICT item 7): the same
ops at n and 4n input rows, mirroring bench/dedup_scale_bench.py for
the relational family. Linear-shaped operators should grow wall ≤~2.5×
at 4× data on a fixed-size machine (superlinear terms: n log n sorts,
spill onset); an accidental pair-materialization regression would show
≥10×.

Input: the sf0.1 orders/lineitem/events tables replicated k× with
SHIFTED keys (o_orderkey/l_orderkey offset per replica, event_id offset
per replica, user_id offset per replica for events) — per-key join
multiplicity and per-user history length stay CONSTANT, so growth
measures the operator's scaling in corpus size, not an artificial skew
blowup. Other tables are reused from the source dir via symlink.

Timing sink is a noop write (full plan executes; see bench.py round-3
methodology note). Run pinned-quiet only (loadavg < ~4):
    taskset -c 0-7 PYTHONPATH=src python bench/join_scale_bench.py
Writes BENCH/join_scaling.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OPS = ["join_range", "join_range_bucketed", "join_asof",
       "join_asof_tolerance", "topk_per_group", "win_turn_order",
       "join_salted_skew", "sessionize_batch"]
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def replicate(spark, sf_dir: str, k: int, out_dir: str) -> str:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def shifted(name, df, shifts):
        parts = []
        for i in range(k):
            p = df
            for col, span in shifts.items():
                p = p.withColumn(col, F.col(col) + i * span)
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # k× data → k× files of CONSTANT size (the production shape:
        # input splits, and with them scan parallelism, grow with the
        # corpus; fixed file count would cap task counts at any scale)
        u.repartition(8 * k).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet"))

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    # documents too (text perturbed per replica like dedup_scale_bench,
    # so dedup candidate structure scales with the corpus) — makes the
    # x-dirs complete enough for bench/query_scaling.py --sf-dir runs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dspan = docs.agg({"doc_id": "max"}).first()[0] * 10
    dparts = []
    for i in range(k):
        dparts.append(docs.select(
            (F.col("doc_id") + i * dspan).alias("doc_id"),
            F.when(F.lit(i) == 0, F.col("text"))
             .otherwise(F.concat_ws(" ", "text", F.lit(f"rep{i}")))
             .alias("text"),
            "lang", "source", "n_chars"))
    du = dparts[0]
    for p in dparts[1:]:
        du = du.unionByName(p)
    du.repartition(8 * k).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))
    okey_span = o.agg({"o_orderkey": "max"}).first()[0] * 10
    ekey_span = e.agg({"event_id": "max"}).first()[0] * 10
    user_span = e.agg({"user_id": "max"}).first()[0] * 10
    cust_span = o.agg({"o_custkey": "max"}).first()[0] * 10
    # user/cust shift by the SAME span so join_salted_skew's
    # events↔orders key overlap is preserved per replica
    span = max(user_span, cust_span)
    shifted("orders", o, {"o_orderkey": okey_span, "o_custkey": span})
    shifted("lineitem", li, {"l_orderkey": okey_span})
    shifted("events", e, {"event_id": ekey_span, "user_id": span})
    for t in TABLES:
        if t in ("orders", "lineitem", "events", "documents"):
            continue
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(sf_dir, f"{t}.parquet"), dst)
    return out_dir


def main() -> None:
    from ocrflow.session import build_session

    import ocrflow.dataops  # noqa: F401
    from ocrflow.queries import QUERIES

    spark = build_session(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    scratch = "/tmp/ocrflow_join_scale"
    dirs = {k: replicate(spark, SF_DIR, k, os.path.join(scratch, f"x{k}"))
            for k in (1, 4)}

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    for op in OPS:                     # warmup (JIT + page cache)
        sink(QUERIES[op](spark, dirs[1]))

    results: dict = {"sf_dir": SF_DIR, "timing": "best_of_2_noop_write",
                     "ops": {}}
    for op in OPS:
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

    out = os.path.join(REPO, "BENCH", "join_scaling.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
