#!/usr/bin/env python
"""Dump .explain("formatted") for queries() keys to files.

Usage: PYTHONPATH=<tree>/src python bench/r06_plans.py OUTDIR SUFFIX KEY...
Writes OUTDIR/<key>_<SUFFIX>.txt. Run once from the round-start worktree
(SUFFIX=before) and once from HEAD (SUFFIX=after).
"""
from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    outdir, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    import ocrflow.dataops  # noqa: F401
    from ocrflow.session import build_session
    from ocrflow.queries import QUERIES

    spark = build_session(master="local[4]", app="r06-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    os.makedirs(outdir, exist_ok=True)
    for k in keys:
        df = QUERIES[k](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{k}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", k, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
