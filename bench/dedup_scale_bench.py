#!/usr/bin/env python
"""Dedup-operator scaling study: the same ops at n and 4n documents.

The round-1 verdict flagged the dedup family as the scale-risk class,
so this measures how the shipped implementations actually grow:
corpus size ×4 should grow wall roughly ×4 (linear pipeline, bounded
per-bucket pair expansion) — an all-pairs regression would show ×16.

Input: the sf0.1 documents table replicated k× with perturbed text
(one replica-tag token appended — keeps each replica cluster
near-duplicate, so candidate structure scales WITH the corpus instead
of vanishing). Deterministic, derived from the driver testdata only.

Run pinned (taskset) like bench/run_bench.py; local[8] on 8 cores:
    taskset -c 0-7 python bench/dedup_scale_bench.py
Writes BENCH/dedup_scaling.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OPS = ["dedup_minhash_lsh", "dedup_lsh_verified", "dedup_materialize",
       "dedup_simhash", "corpus_quality_filter", "corpus_stats"]


def replicate(spark, sf_dir: str, k: int, out_dir: str) -> str:
    """k perturbed copies of documents.parquet → a new sf-style dir."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    parts = []
    for i in range(k):
        parts.append(docs.select(
            (F.col("doc_id") + i * 10 * n).alias("doc_id"),
            F.when(F.lit(i) == 0, F.col("text"))
             .otherwise(F.concat_ws(" ", "text", F.lit(f"rep{i}")))
             .alias("text"),
            "lang", "source", "n_chars"))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    os.makedirs(out_dir, exist_ok=True)
    df.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet"))
    return out_dir


def main() -> None:
    from ocrflow.session import build_session

    import ocrflow.dataops as D

    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {"sf_dir": SF_DIR, "ops": {}}
    scratch = "/tmp/ocrflow_dedup_scale"
    dirs = {}
    for k in (1, 4):
        dirs[k] = replicate(spark, SF_DIR, k, os.path.join(scratch, f"x{k}"))

    # JVM/codegen warmup outside the timed region (the first measured
    # op otherwise absorbs ~10s of session warmup into its 1× number)
    for op in OPS:
        D.QUERIES[op](spark, dirs[1]).count()

    for op in OPS:
        fn = D.QUERIES[op]
        walls = {}
        rows = {}
        for k in (1, 4):
            best = float("inf")
            for _ in range(2):  # best-of-2 against neighbor noise
                t0 = time.perf_counter()
                n = fn(spark, dirs[k]).count()
                best = min(best, time.perf_counter() - t0)
            walls[k] = round(best, 2)
            rows[k] = n
        growth = round(walls[4] / walls[1], 2) if walls[1] > 0 else None
        results["ops"][op] = {"wall_1x_s": walls[1], "wall_4x_s": walls[4],
                              "rows_1x": rows[1], "rows_4x": rows[4],
                              "wall_growth_4x": growth}
        print(op, results["ops"][op], flush=True)

    out = os.path.join(REPO, "BENCH", "dedup_scaling.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
