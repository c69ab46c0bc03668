#!/usr/bin/env python
"""16x data growth for the round-5 text ops (deep-scaling evidence,
the r03-x16 protocol): decontaminate_fuzzy's output grows ~k^2 on a
replicated corpus (replica benches hit replica corpora), so the
interesting number is wall vs OUTPUT growth; pii_redact/url_dedup
should stay ~linear. Pinned local[8], noop sink, best-of-2.

    taskset -c 0-7 env PYTHONPATH=src python bench/r05_x16_growth.py
Writes BENCH/r05_x16_growth.json.
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
OPS = ["decontaminate_fuzzy", "text_pii_redact", "corpus_url_dedup"]
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
                                 "facts replicated x1/x16", "ops": {}}
    scratch = "/tmp/ocrflow_r05_x16"
    dirs = {}
    for k in (1, 16):
        out = os.path.join(scratch, f"x{k}")
        replicate(spark, SF_DIR, k, out)
        for name in STATIC_TABLES:
            src = f"{SF_DIR}/{name}.parquet"
            dst = os.path.join(out, f"{name}.parquet")
            if not os.path.exists(dst):
                (shutil.copytree if os.path.isdir(src)
                 else shutil.copy2)(src, dst)
        dirs[k] = out

    def sink(df):
        df.write.format("noop").mode("overwrite").save()

    for op in OPS:
        sink(QUERIES[op](spark, dirs[1]))  # warmup
    for op in OPS:
        fn = QUERIES[op]
        walls, rows = {}, {}
        for k in (1, 16):
            rows[k] = fn(spark, dirs[k]).count()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                sink(fn(spark, dirs[k]))
                best = min(best, time.perf_counter() - t0)
            walls[k] = round(best, 2)
        results["ops"][op] = {
            "wall_1x_s": walls[1], "wall_16x_s": walls[16],
            "rows_1x": rows[1], "rows_16x": rows[16],
            "wall_growth_16x": round(walls[16] / max(walls[1], 1e-9), 2)}
        print(op, results["ops"][op], flush=True)
    with open(os.path.join(REPO, "BENCH", "r05_x16_growth.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote BENCH/r05_x16_growth.json", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
