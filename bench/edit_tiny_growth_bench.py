#!/usr/bin/env python
"""Degenerate-corpus growth study for the edit-distance scanner's
tiny-doc sentinel path (round-5 VERDICT item #7).

The q-gram pigeonhole cannot filter docs shorter than d*q + q = 20
chars, so those ride length-keyed SENTINEL buckets that are exempt
from the hot-gram cap (unconditional losslessness — the round-5
ADVICE fix). That exemption makes the sentinel path the scanner's
worst case: an ALL-tiny corpus generates candidate pairs
quadratically within each length bucket. This bench measures exactly
that corpus — n and 4n random tiny docs (lengths 5..23, uniform) —
and reports wall, candidate counts, and verified-pair counts at both
sizes.

What "bounded" means here: for RANDOM tiny docs the candidate set is
Theta(n^2 / |length buckets|) BY DESIGN (sub-pigeonhole docs are
unfilterable without losing pairs), but each candidate costs one
levenshtein over <=23-char strings — the bench shows the measured
wall growth so the quadratic constant is a recorded number, not a
guess. Note the output itself is Omega(n^2) when tiny docs repeat
(n identical docs = n(n-1)/2 TRUE pairs), so no exact scanner can be
subquadratic on this corpus class; the honest scale answer at 100 TB
is the quality gate most pipelines already run (drop sub-20-char
docs) or exact-hash dedup first — both documented in the scanner's
docstring.

Run pinned: taskset -c 0-7 python bench/edit_tiny_growth_bench.py
Writes BENCH/r05_edit_tiny_growth.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))

# Sized for the quadratic sentinel path: with lengths uniform on
# 5..23, n docs put n/19 in each length bucket and each prefix doc
# meets ~9n/19 containers, so candidates ~ 9n^2/19 — 3,000 docs is
# ~4M candidate pairs at 1x and ~68M at 4x, the largest 4x this
# host verifies in minutes. (The first attempt used 20k/80k docs =
# 3e9 pairs at 4x — the quadratic bound is the finding, recorded
# here instead of burned into wall-clock.)
N_BASE = 3_000


def tiny_docs(spark, n: int):
    """n deterministic pseudo-random tiny docs, lengths 5..23."""
    from pyspark.sql import functions as F
    d = spark.range(n).select(F.col("id").alias("doc_id"))
    ln = (F.abs(F.xxhash64(F.col("doc_id"))) % 19 + 5).cast("int")
    # deterministic lowercase text: md5 hex of the id, truncated to ln
    txt = F.substring(F.md5(F.col("doc_id").cast("string")), 1, ln)
    return d.select("doc_id", txt.alias("text"),
                    F.char_length(txt).alias("ln"))


def main() -> None:
    from ocrflow.session import build_session
    from ocrflow.dataops import EDIT_D, edit_candidates
    from pyspark.sql import functions as F

    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n_base": N_BASE, "sizes": {}}
    # warmup
    edit_candidates(tiny_docs(spark, 2000)).count()

    for k in (1, 4):
        n = N_BASE * k
        docs = tiny_docs(spark, n)
        best_c, n_cand = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            n_cand = edit_candidates(docs).count()
            best_c = min(best_c, time.perf_counter() - t0)
        # full scanner: candidates + exact levenshtein verify
        cands = edit_candidates(docs)
        j = (cands.join(docs.select(F.col("doc_id").alias("doc_a"),
                                    F.col("text").alias("ta"),
                                    F.col("ln").alias("la")), "doc_a")
             .join(docs.select(F.col("doc_id").alias("doc_b"),
                               F.col("text").alias("tb"),
                               F.col("ln").alias("lb")), "doc_b")
             .filter(F.abs(F.col("la") - F.col("lb")) <= EDIT_D)
             .filter(F.levenshtein("ta", "tb") <= EDIT_D))
        best_v, n_true = float("inf"), None
        for _ in range(2):
            t0 = time.perf_counter()
            n_true = j.count()
            best_v = min(best_v, time.perf_counter() - t0)
        out["sizes"][f"x{k}"] = {
            "n_docs": n, "candidates": n_cand, "true_pairs": n_true,
            "wall_candidates_s": round(best_c, 2),
            "wall_full_scan_s": round(best_v, 2)}
        print(k, out["sizes"][f"x{k}"], flush=True)

    a, b = out["sizes"]["x1"], out["sizes"]["x4"]
    out["wall_growth_4x"] = round(b["wall_full_scan_s"]
                                  / max(a["wall_full_scan_s"], 1e-9), 2)
    out["cand_growth_4x"] = round(b["candidates"]
                                  / max(a["candidates"], 1), 2)
    path = os.path.join(REPO, "BENCH", "r05_edit_tiny_growth.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
