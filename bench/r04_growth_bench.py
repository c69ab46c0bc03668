#!/usr/bin/env python
"""Growth study for the round-4 operators: same op at 1× and 4× data.

Same protocol as bench/dedup_scale_bench.py with the r03 corrections
baked in: noop-write sink (count() lets Catalyst prune), file count
scaling with data (repartition(8k) — scan parallelism caps at file
count), best-of-2 per (op, scale). Linear pipelines should grow wall
≈×4; an all-pairs regression shows ×16.

Replicates every table an op reads, shifting keys so per-replica
structure (dup clusters, label blocks, funnels) repeats instead of
vanishing: documents get a replica token appended, events shift
user/event ids, embeddings shift vec ids and labels, orders/lineitem
shift order keys.

Run pinned at loadavg < ~1.5:
    taskset -c 0-7 env PYTHONPATH=src python bench/r04_growth_bench.py
Writes BENCH/r04_growth.json.
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
    "dedup_containment_scanner", "tfidf_cosine_pairs",
    "ngram_novelty_curve", "dedup_cluster_histogram",
    "corpus_source_contamination", "text_zipf_fit",
    "conv_reassembly_order", "funnel_within_window",
    "emb_cosine_block_pairs", "join_runtime_bloom",
]


def replicate(spark, sf_dir: str, k: int, out_dir: str) -> str:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    parts = [docs.select(
        (F.col("doc_id") + i * 10 * n).alias("doc_id"),
        F.when(F.lit(i) == 0, F.col("text"))
         .otherwise(F.concat_ws(" ", "text", F.lit(f"rep{i}"))).alias("text"),
        "lang", "source", "n_chars") for i in range(k)]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(8 * k).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ne = ev.count()
    parts = [ev.select((F.col("event_id") + i * 10 * ne).alias("event_id"),
                       "ts",
                       (F.col("user_id") + i * 10_000_000).alias("user_id"),
                       "event_type", "value", "props") for i in range(k)]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(8 * k).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet"))

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nv = em.count()
    parts = [em.select((F.col("vec_id") + i * 10 * nv).alias("vec_id"),
                       "embedding",
                       (F.col("label") + i * 100_000).alias("label"))
             for i in range(k)]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(8 * k).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet"))

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    no = orders.count()
    parts = [orders.select(
        (F.col("o_orderkey") + i * 10 * no).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority") for i in range(k)]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(8 * k).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet"))

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = [c for c in li.columns if c != "l_orderkey"]
    parts = [li.select(
        (F.col("l_orderkey") + i * 10 * no).alias("l_orderkey"), *cols)
        for i in range(k)]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.repartition(8 * k).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet"))
    return out_dir


def main() -> None:
    from ocrflow.session import build_session
    import ocrflow.dataops  # noqa: F401
    import ocrflow.multimodal  # noqa: F401
    from ocrflow.queries import QUERIES

    spark = build_session(master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {"sf_dir": SF_DIR, "loadavg": os.getloadavg(),
                     "protocol": "pinned local[8], noop sink, best-of-2, "
                                 "files scale with data (8k)", "ops": {}}
    scratch = "/tmp/ocrflow_r04_scale"
    dirs = {k: replicate(spark, SF_DIR, k, os.path.join(scratch, f"x{k}"))
            for k in (1, 4)}

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

    with open(os.path.join(REPO, "BENCH", "r04_growth.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote BENCH/r04_growth.json")
    spark.stop()


if __name__ == "__main__":
    main()
