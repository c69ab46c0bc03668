"""Resume/fault + lineage tests (SURVEY.md §5.5) and icelite semantics."""

import json
import os

import pytest

from ocrflow import reference as R
from ocrflow import synth
from ocrflow.icelite import IceliteTable, write_dataframe_files
from ocrflow.runner import run_extract


@pytest.fixture()
def input_dir(spark, tmp_path):
    rows = synth.gen_rows(300, seed=42, monster_every=0)
    df = spark.createDataFrame(rows, schema=synth.TRANSCRIPTS_DDL)
    path = str(tmp_path / "transcripts")
    df.repartition(4).write.parquet(path)  # 4 input files
    return path


def test_icelite_snapshot_isolation(spark, tmp_path):
    tbl = IceliteTable(str(tmp_path / "tbl"))
    assert tbl.current_snapshot_id() is None
    d1 = tbl.new_commit_dir("c1")
    f1 = write_dataframe_files(spark.range(10).toDF("id"), d1)
    s1 = tbl.commit_append(f1)
    d2 = tbl.new_commit_dir("c2")
    f2 = write_dataframe_files(spark.range(10, 25).toDF("id"), d2)
    s2 = tbl.commit_append(f2)
    assert (s1, s2) == (1, 2)
    assert tbl.read(spark, snapshot_id=s1).count() == 10   # time travel
    assert tbl.read(spark).count() == 25                   # current
    snaps = tbl.snapshots()
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[1]["parent_id"] == 1


def test_run_commit_resume_byte_identical(spark, input_dir, tmp_path):
    out = str(tmp_path / "extracted")

    # run 1: process only 2 of 4 input files, then "crash"
    r1 = run_extract(spark, input_dir, out, run_id="run-a",
                     partitions=4, max_files=2)
    assert r1["files_processed"] == 2

    # resume: remaining files only
    r2 = run_extract(spark, input_dir, out, run_id="run-b", partitions=4)
    assert r2["files_processed"] == 2
    assert r2["skipped"] == 2

    # third run: nothing pending (idempotent)
    r3 = run_extract(spark, input_dir, out, run_id="run-c", partitions=4)
    assert r3["files_processed"] == 0

    # union across snapshots equals a golden full pass, byte-for-byte
    tbl = IceliteTable(out)
    got = {(r["conv_id"], r["turn_idx"]): r["extracted_text"]
           for r in tbl.read(spark).collect()}
    rows = synth.gen_rows(300, seed=42, monster_every=0)
    assert len(got) == len(rows)
    for row in rows:
        assert got[(row["conv_id"], row["turn_idx"])] == \
            R.extract_turn(row["text"], role=row["role"]).extracted_text

    # snapshot history: 2 data commits
    assert [s["snapshot_id"] for s in tbl.snapshots()] == [1, 2]


def test_lineage_rows(spark, input_dir, tmp_path):
    out = str(tmp_path / "extracted")
    run_extract(spark, input_dir, out, run_id="run-l", partitions=4)
    lin = IceliteTable(os.path.join(out, "lineage")).read(spark)
    cols = set(lin.columns)
    assert {"run_id", "snapshot_id", "partition_id", "input_file",
            "turn_lo", "turn_hi", "rows_in", "rows_out", "wall_ms",
            "ts"} <= cols
    tasks = lin.filter("partition_id >= 0").collect()
    assert tasks, "per-task lineage rows missing"
    assert sum(r["rows_out"] for r in tasks) == 300
    assert all(r["wall_ms"] > 0 for r in tasks)
    assert all(r["turn_lo"] >= 0 and r["turn_hi"] >= r["turn_lo"] for r in tasks)
    # per-file completion markers cover all 4 input files
    files = {r["input_file"] for r in lin.filter("partition_id = -1").collect()}
    assert len(files) == 4


def test_failed_write_leaves_table_untouched(spark, input_dir, tmp_path):
    out = str(tmp_path / "extracted")
    run_extract(spark, input_dir, out, run_id="ok", partitions=2, max_files=1)
    tbl = IceliteTable(out)
    sid = tbl.current_snapshot_id()
    files_before = tbl.file_list()
    # simulate a crash AFTER data files land but BEFORE commit: orphan dir
    orphan = tbl.new_commit_dir("orphan")
    write_dataframe_files(spark.range(5).toDF("x"), orphan)
    assert tbl.current_snapshot_id() == sid
    assert tbl.file_list() == files_before  # reader view unchanged


def test_bucketed_output_layout_and_pruning(spark, input_dir, tmp_path):
    out = str(tmp_path / "extracted")
    run_extract(spark, input_dir, out, run_id="run-b", partitions=4)
    tbl = IceliteTable(out)
    files = tbl.file_list()
    assert any("_cb=" in f for f in files)  # hive-partitioned layout
    full = tbl.read(spark)
    assert "conv_bucket" in full.columns    # recoverable without basePath
    assert full.count() == 300
    # manifest-level pruning: one bucket reads strictly fewer files
    some = full.select("conv_bucket").first()["conv_bucket"]
    pruned = tbl.read(spark, path_filter=f"_cb={some}/")
    assert 0 < pruned.count() < 300
    assert pruned.select("conv_bucket").distinct().count() == 1
