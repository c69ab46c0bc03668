#!/usr/bin/env python
"""Driver bench contract: run headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Headline metric: wall seconds for the suite (unit: sec), with the
flagship extraction throughput (turns/sec) and per-query seconds
reported alongside. The extraction input is synthesized distributedly
(ocrflow.synth) — deterministic, seed 42, no external data.

Env knobs:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32
  OCRFLOW_BENCH_TURNS  default 200000 (extraction input size)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TURNS = int(os.environ.get("OCRFLOW_BENCH_TURNS", "200000"))

HEADLINE = [
    "scan_pruned", "project_expr", "agg_hash", "agg_collect_sorted",
    "join_inner_equi", "join_broadcast", "join_asof", "join_salted_skew",
    "win_running", "topk_per_group", "str_regexp", "array_higher_order",
    "tpch_q3_shape", "tpch_q5_shape", "sessionize_batch",
    "dedup_exact", "dedup_minhash_lsh", "ann_bruteforce_cosine",
    "text_quality_score", "dedup_materialize",
    # round-3 late additions (suite total therefore grows vs r02; the
    # cross-round comparable number is suite_r01_keys_subtotal and the
    # per-query seconds)
    "corpus_curation_e2e", "skyline_pareto", "heavy_hitters_mg",
    # round-4 additions: the subquadratic containment scanner and the
    # source-novelty curve (both new families this round)
    "dedup_containment_scanner", "ngram_novelty_curve",
    # round-4 continuation: iterative BFS (graph family) and pure
    # array-math quantization (vector family)
    "graph_shortest_hops", "emb_quantize_int8",
    # round-4 TPC-H completion: the broadcast-heavy snowflake and the
    # semi+anti self-join, representing the 14 shapes added this round
    "tpch_q7_shape", "tpch_q21_shape",
    # round-4 session-5: the exact-substring scanner (memorization-risk
    # family) and the unbounded-history blocked EWMA
    "dedup_kgram_exact", "ts_ewma_blocked",
    # round-4 session-7: the edit-distance q-gram scanner (completes the
    # near-dup scanner triad) and the in-array market-basket expansion
    "dedup_edit_scanner", "assoc_pairs_support",
    # round-4 session-8: sorted-neighborhood ER blocking (rank equi-join,
    # no single-partition window) and the JL projection (pure JVM
    # array-math dim reduction for the ANN family)
    "er_sorted_neighborhood", "emb_jl_projection",
    # round-4 session-9: the retrieval family's ranked-search key and
    # the inferential-stats family's distributed prefix-sum ECDF key
    "search_bm25_topk", "stat_ks_two_sample",
    # round-5: lossless fuzzy decontamination (broadcast-bench gram
    # join) and URL-normalized dedup (the web-crawl first pass)
    "decontaminate_fuzzy", "corpus_url_dedup",
]


def main() -> None:
    import ocrflow.dataops  # noqa: F401 — registers dataops queries
    from ocrflow.session import build_session
    from ocrflow.pipeline import extract_df
    from ocrflow.queries import QUERIES
    from ocrflow.synth import synth_dataframe

    spark = build_session(master=f"local[{CPUS}]", app="ocrflow-bench",
                          shuffle_partitions=max(CPUS, 8))
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # flagship: distributed synth → extraction kernel → count (forces kernel)
    transcripts = synth_dataframe(spark, N_TURNS, seed=42,
                                  partitions=max(CPUS * 2, 16))
    transcripts = transcripts.persist()
    n_in = transcripts.count()  # materialize input outside the timed region
    # best-of-2: the host carries variable neighbor load (BENCH/BASELINE.md)
    extract_secs = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        n_out = extract_df(spark, transcripts, partitions=max(CPUS * 2, 16)).count()
        extract_secs = min(extract_secs, time.perf_counter() - t0)
    transcripts.unpersist()
    timings["extract_pipeline"] = round(extract_secs, 3)

    # best-of-2 per query (like the extraction): single-shot timings on
    # this host swing 3×+ with invisible neighbor load (BENCH/r02_notes.md).
    # Timing sink is a NOOP WRITE, not count(): count() lets Catalyst
    # prune unconsumed expressions (join_asof's whole window was pruned
    # — 59 bytes of shuffle — so r01/r02 count()-timed numbers
    # under-measured some queries; methodology fixed in round 3 and the
    # one-time delta documented in BENCH/r03_notes.md).
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # apples-to-apples continuity vs BENCH_r01: the r01 suite had 20
    # keys (extract_pipeline + 19 queries, through text_quality_score).
    # Every later suite addition must be excluded from the continuity
    # subtotal — through round 3 the exclusion set only carried the r02
    # key, so the r03-reported subtotal silently absorbed the three r03
    # additions (~3.4 s); corrected here and documented in
    # BENCH/r04_notes.md with the recomputed r03 value.
    later_additions = {
        "dedup_materialize",                                    # r02
        "corpus_curation_e2e", "skyline_pareto",
        "heavy_hitters_mg",                                     # r03
        "dedup_containment_scanner", "ngram_novelty_curve",     # r04
        "graph_shortest_hops", "emb_quantize_int8",             # r04 cont.
        "tpch_q7_shape", "tpch_q21_shape",                      # r04 tpch
        "dedup_kgram_exact", "ts_ewma_blocked",                 # r04 s5
        "dedup_edit_scanner", "assoc_pairs_support",            # r04 s7
        # r04 sessions 8-9 — MISSED when added to HEADLINE, so the
        # r04-reported subtotal (18.093) silently absorbed these four
        # (2.563 s): true r04 r01-subtotal was 15.530 s, FASTER than
        # r03's 16.84 — the r04 VERDICT's "~7% slower" was this bug.
        # Documented in BENCH/r05_notes.md.
        "er_sorted_neighborhood", "emb_jl_projection",          # r04 s8
        "search_bm25_topk", "stat_ks_two_sample",               # r04 s9
        "decontaminate_fuzzy", "corpus_url_dedup",              # r05
    }
    r01_subtotal = round(sum(v for k, v in timings.items()
                             if k not in later_additions), 3)
    print(json.dumps({
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "timing": "best_of_2_noop_write",
        "suite_r01_keys_subtotal": r01_subtotal,
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "extraction": {
            "turns_in": n_in,
            "turns_out": n_out,
            "secs": round(extract_secs, 3),
            "turns_per_sec": round(n_out / extract_secs, 1),
            "cpus": CPUS,
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
