"""Resumable extraction runs: icelite snapshots + per-partition lineage.

The A11 operator (SURVEY.md §2.A): each run processes the input files
not yet recorded as completed, commits output + lineage atomically as a
new snapshot, and a re-run after a crash picks up exactly the pending
remainder (resume = anti-join on completed input files). Idempotent:
commit happens only after the chunk's output is fully written, so a
failed run leaves the table at its previous snapshot.

Lineage rows (BASELINE.json north_star: "per-partition lineage rows
(partition id, input file, turn-range, rows-in/out, wall-time) written
to a metrics table") come from the kernel's list accumulator — zero
extra Spark jobs; per-input-file completion comes from a cheap
column-pruned scan of the just-written output.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import SparkSession, functions as F

from .icelite import IceliteTable, write_dataframe_files
from .pipeline import extract_df

LINEAGE_DDL = ("run_id string, snapshot_id bigint, partition_id int, "
               "input_file string, turn_lo bigint, turn_hi bigint, "
               "rows_in bigint, rows_out bigint, wall_ms double, ts timestamp")


class _ListAccum(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


def list_input_files(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, n) for n in os.listdir(input_path)
            if n.endswith(".parquet"))
    return [input_path]


def completed_input_files(spark: SparkSession, lineage_table: IceliteTable) -> set[str]:
    if lineage_table.current_snapshot_id() is None:
        return set()
    # only the per-file completion markers (partition_id = -1); per-task
    # rows carry file:// URIs / comma-joined lists and are metrics-only
    rows = (lineage_table.read(spark)
            .filter(F.col("partition_id") == -1)
            .select("input_file").distinct().collect())
    return {r["input_file"] for r in rows}


N_CONV_BUCKETS = 16


def run_extract(spark: SparkSession, input_path: str, out_table_path: str,
                run_id: str | None = None, partitions: int | None = None,
                salt_buckets: int = 8, max_files: int | None = None,
                bucket_output: bool = True) -> dict:
    """One resumable extraction run. Returns a summary dict.

    ``max_files`` caps how many pending input files this run processes —
    the unit of commit granularity (and the crash-injection knob for
    the resume test, SURVEY.md §5.5).
    """
    run_id = run_id or f"run-{uuid.uuid4().hex[:12]}"
    out = IceliteTable(out_table_path)
    lineage = IceliteTable(os.path.join(out_table_path, "lineage"))

    all_files = list_input_files(input_path)
    done = completed_input_files(spark, lineage)
    pending = [f for f in all_files if f not in done]
    if max_files is not None:
        pending = pending[:max_files]
    if not pending:
        return {"run_id": run_id, "snapshot_id": out.current_snapshot_id(),
                "files_processed": 0, "rows_out": 0, "skipped": len(done)}

    acc = spark.sparkContext.accumulator([], _ListAccum())
    df = (spark.read.parquet(*pending)
          .withColumn("_input_file", F.input_file_name()))
    extracted = extract_df(spark, df, partitions=partitions,
                           salt_buckets=salt_buckets,
                           lineage_acc=acc, input_file_col="_input_file")

    t0 = time.time()
    commit_dir = out.new_commit_dir(f"{run_id}-{uuid.uuid4().hex[:6]}")
    if bucket_output:
        # output layout partitioned by conv_bucket (SURVEY.md §4):
        # downstream conversation-level reads prune to their buckets at
        # the manifest level. Kept as a regular column too, so reading
        # leaf files directly (no basePath) still sees it. Trade-off:
        # files multiply by (tasks x buckets); at small inputs that is
        # many tiny files — compact with a pre-write repartition("_cb")
        # when commit sizes warrant it.
        extracted = extracted.withColumn(
            "conv_bucket",
            F.pmod(F.xxhash64("conv_id"), F.lit(N_CONV_BUCKETS)).cast("int"))
        files = write_dataframe_files(
            extracted.withColumn("_cb", F.col("conv_bucket")),
            commit_dir, partition_by=("_cb",))
    else:
        files = write_dataframe_files(extracted, commit_dir)
    wall_s = time.time() - t0

    sid_guess = (out.current_snapshot_id() or 0) + 1
    # per-task lineage from the accumulator (partition id, rows, turn range, wall)
    ddl = ("run_id string, snapshot_id bigint, partition_id int, "
           "input_file string, turn_lo bigint, turn_hi bigint, "
           "rows_in bigint, rows_out bigint, wall_ms double")
    lineage_rows = [
        (run_id, sid_guess, int(pid), in_files, int(lo), int(hi),
         int(rin), int(rout), float(ms))
        for (pid, in_files, rin, rout, lo, hi, ms) in acc.value]
    ldf = (spark.createDataFrame(lineage_rows, ddl)
           .withColumn("ts", F.current_timestamp()))
    # exact per-input-file completion markers (partition_id = -1): resume
    # anti-joins on these even when one task consumed several files
    file_rows = [(run_id, sid_guess, -1, f, -1, -1, -1, -1, 0.0)
                 for f in pending]
    fdf = (spark.createDataFrame(file_rows, ddl)
           .withColumn("ts", F.current_timestamp()))
    lineage_commit_dir = lineage.new_commit_dir(f"{run_id}-{uuid.uuid4().hex[:6]}")
    lfiles = write_dataframe_files(ldf.unionByName(fdf).coalesce(1),
                                   lineage_commit_dir)

    # atomic commit order: data snapshot first, then lineage (resume keys
    # off lineage, so a crash between the two re-processes — idempotent
    # because the new data commit replaces nothing and readers follow
    # the lineage-confirmed snapshot)
    sid = out.commit_append(files, props={"run_id": run_id,
                                          "input_files": len(pending)})
    lineage.commit_append(lfiles, props={"run_id": run_id, "snapshot_id": sid})

    rows_out = sum(int(r[3]) for r in acc.value if r[3] >= 0)
    return {"run_id": run_id, "snapshot_id": sid,
            "files_processed": len(pending), "rows_out": rows_out,
            "wall_s": round(wall_s, 3), "skipped": len(done)}
