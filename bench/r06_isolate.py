#!/usr/bin/env python
"""Round-6 isolation harness (guide §1.4): time individual queries()
keys with the noop sink, labeled jobs, and optional plan capture.

Usage:
  python bench/r06_isolate.py KEY [KEY...] [--sf DIR] [--reps N]
      [--explain OUTDIR] [--loadavg]

Prints one JSON line: {"sf":..., "reps":N, "loadavg":[...], "keys":
{name: {"best":s, "all":[...]}}}. Writes .explain("formatted") to
OUTDIR/<key>.txt when --explain is given. Does NOT touch bench.py
(frozen for measurement).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "src"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain", default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ocrflow.dataops  # noqa: F401
    from ocrflow.session import build_session
    from ocrflow.queries import QUERIES

    spark = build_session(master=f"local[{args.cpus}]", app="r06-isolate",
                          shuffle_partitions=max(args.cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}
    load0 = os.getloadavg()
    for name in args.keys:
        fn = QUERIES[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"isolate:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"best": min(times), "all": times}
    print(json.dumps({"sf": args.sf, "reps": args.reps,
                      "loadavg_start": load0, "loadavg_end": os.getloadavg(),
                      "keys": out}))
    spark.stop()


if __name__ == "__main__":
    main()
