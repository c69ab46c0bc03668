"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship extraction pipeline on sf0.001 (documents
                payloads mapped into the transcripts shape, SURVEY §3.3)
queries()     — operator corpus from SURVEY.md §2.B (ocrflow.queries)
oracle_sql()  — matching DuckDB SQL for the value-hash comparison
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src")
if _SRC not in sys.path:
    sys.path.insert(0, _SRC)
# executors fork python workers that need the package importable too
if _SRC not in os.environ.get("PYTHONPATH", "").split(":"):
    os.environ["PYTHONPATH"] = (_SRC + ":" + os.environ.get("PYTHONPATH", "")).rstrip(":")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full extraction pipeline over sf0.001 documents
    re-shaped into transcripts(conv_id, turn_idx, role, text, tool, ts)."""
    from ocrflow.pipeline import extract_df

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    transcripts = docs.select(
        F.concat(F.lit("conv-"), F.lpad((F.col("doc_id") % 50).cast("string"), 8, "0")
                 ).alias("conv_id"),
        (F.col("doc_id") / 50).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    return extract_df(spark, transcripts, partitions=8, salt_buckets=4)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import ocrflow.dataops  # noqa: F401 — registers into QUERIES
    import ocrflow.multimodal  # noqa: F401 — registers into QUERIES
    from ocrflow.queries import QUERIES
    from ocrflow.streaming import STREAM_QUERIES
    return {**QUERIES, **STREAM_QUERIES}


def oracle_sql() -> dict[str, str]:
    import ocrflow.dataops  # noqa: F401 — registers into ORACLE
    import ocrflow.multimodal  # noqa: F401 — registers into ORACLE
    from ocrflow.queries import ORACLE
    return dict(ORACLE)
