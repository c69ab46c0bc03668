#!/usr/bin/env python
"""Plan audit: compile every batch queries() key at sf0.001 and record
physical-plan shape statistics — exchanges, joins (by strategy), scans,
WholeStageCodegen spans, pushed filters — to BENCH/plan_audit.json.

This is the systematic version of tests/test_plan_shape.py's spot
checks: a reviewer can grep one JSON for "which operators shuffle more
than once" or "which joins are broadcast" instead of reading 150 plans.
Streaming keys are skipped (building them executes a stream); keys
that run jobs during plan construction (iterative ops) still work —
they're just slower to audit.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src"))
sys.path.insert(0, REPO)

SF = os.environ.get("OCRFLOW_AUDIT_SF_DIR", "/root/testdata/sf0.001")

SKIP_PREFIXES = ("stream_",)
SKIP_KEYS = {
    # builders that execute Spark jobs/loops before returning a frame —
    # auditable but slow; their plans are asserted in test_plan_shape
    "dedup_materialize", "dedup_materialize_lsh", "iter_pagerank",
    "ann_ivf_coarse", "sink_partitioned", "source_icelite_snapshot",
    "source_python_datasource_stream",  # runs a streaming query
}


def audit(plan: str) -> dict:
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin")
        + plan.count("CartesianProduct"),
        "file_scans": plan.count("FileScan parquet"),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)",
                                            plan))),
        "pushed_filter_scans": len(
            [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
             if m.strip()]),
        "python_udf_nodes": plan.count("Python") and (
            plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")
            + plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas")
            + plan.count("PythonMapInArrow") + plan.count("MapInArrow")
            + plan.count("FlatMapCoGroupsInPandas")),
    }


def main() -> None:
    from ocrflow.session import build_session

    import __spark_entry__ as E

    spark = build_session()
    spark.sparkContext.setLogLevel("ERROR")
    Q = E.queries()
    out: dict = {}
    skipped = []
    for k, fn in Q.items():
        if k.startswith(SKIP_PREFIXES) or k in SKIP_KEYS:
            skipped.append(k)
            continue
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[k] = audit(plan)
        except Exception as ex:  # noqa: BLE001 — record, don't die
            out[k] = {"error": repr(ex)[:200]}
        print(k, out[k], flush=True)
    report = {
        "sf_dir": SF, "audited": len(out), "skipped": skipped,
        "note": ("plans compiled at sf0.001 with the repo session (AQE on); "
                 "counts are pre-AQE-reoptimization shapes"),
        "plans": out,
    }
    with open(os.path.join(REPO, "BENCH", "plan_audit.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    errs = [k for k, v in out.items() if "error" in v]
    multi_shuffle = sorted((k for k, v in out.items()
                            if v.get("exchanges", 0) > 2))
    print(json.dumps({"audited": len(out), "errors": errs,
                      "over_2_exchanges": multi_shuffle}))
    spark.stop()


if __name__ == "__main__":
    main()
