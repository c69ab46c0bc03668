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


def test_orphan_data_commit_expired_on_resume(spark, input_dir, tmp_path):
    """Crash between data commit and lineage commit: the orphan head is
    expired on the next run, so the redo never duplicates rows for
    readers following CURRENT (ADVICE round-1 medium)."""
    out = str(tmp_path / "extracted")
    r1 = run_extract(spark, input_dir, out, run_id="ok", partitions=4,
                     max_files=2)
    tbl = IceliteTable(out)

    # simulate the crash: a data commit tagged with a run_id whose
    # lineage commit never landed (exactly what run_extract writes
    # before the lineage append)
    d = tbl.new_commit_dir("crashed")
    f = write_dataframe_files(spark.range(7).toDF("x"), d)
    orphan_sid = tbl.commit_append(f, props={"run_id": "crashed",
                                             "input_files": 1})
    assert tbl.current_snapshot_id() == orphan_sid

    r2 = run_extract(spark, input_dir, out, run_id="redo", partitions=4)
    assert r2["files_processed"] == 2 and r2["skipped"] == 2
    got = {(r["conv_id"], r["turn_idx"]): r["extracted_text"]
           for r in tbl.read(spark).collect()}
    rows = synth.gen_rows(300, seed=42, monster_every=0)
    assert len(got) == len(rows)  # no orphan rows, no duplicates
    # the orphan's snapshot-id slot was reused by the redo commit
    assert tbl.current_snapshot_id() == orphan_sid
    assert "x" not in tbl.read(spark).columns


def test_lineage_dedup_on_task_retry():
    """Accumulator rows replayed by a task retry collapse to one row
    per partition (VERDICT round-1 wrong #5)."""
    from ocrflow.runner import _dedup_lineage_rows
    row_p0 = (0, "f1", 10, 10, 0, 9, 5.0)
    row_p1 = (1, "f2", 20, 20, 0, 19, 7.0)
    deduped = _dedup_lineage_rows([row_p0, row_p1, row_p0, row_p1, row_p0])
    assert sorted(deduped) == [row_p0, row_p1]


def test_stream_epoch_replay_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed epoch must not
    re-append (ADVICE round-1 medium)."""
    from ocrflow import synth
    from ocrflow.streaming import commit_epoch

    tbl = IceliteTable(str(tmp_path / "stream_tbl"))
    rows = synth.gen_rows(50, seed=7, monster_every=0)
    df = spark.createDataFrame(rows, schema=synth.TRANSCRIPTS_DDL)

    assert commit_epoch(tbl, df, epoch_id=0, partitions=2) == 1
    n1 = tbl.read(spark).count()
    files_1 = tbl.file_list()
    # replay the same epoch (crash after commit, before checkpoint)
    assert commit_epoch(tbl, df, epoch_id=0, partitions=2) is None
    assert tbl.read(spark).count() == n1
    assert tbl.file_list() == files_1          # old files untouched
    assert commit_epoch(tbl, df, epoch_id=1, partitions=2) == 2
    assert tbl.read(spark).count() == 2 * n1


def test_compaction_reduces_files_keeps_rows_and_history(spark, tmp_path):
    """icelite compact(): many small commits → few right-sized files;
    rows identical, old snapshots still time-travelable, resume-style
    appends continue on top (VERDICT round-1 missing #3)."""
    tbl = IceliteTable(str(tmp_path / "tbl"))
    for i in range(5):
        d = tbl.new_commit_dir(f"c{i}")
        f = write_dataframe_files(
            spark.range(i * 10, (i + 1) * 10).toDF("id").repartition(4), d)
        tbl.commit_append(f)
    files_before = tbl.file_list()
    rows_before = {r["id"] for r in tbl.read(spark).collect()}
    sid_before = tbl.current_snapshot_id()

    sid = tbl.compact(spark, target_file_bytes=1 << 30)  # → 1 file
    assert sid == sid_before + 1
    assert len(tbl.file_list()) < len(files_before)
    assert {r["id"] for r in tbl.read(spark).collect()} == rows_before
    # time travel across the rewrite still works
    assert tbl.read(spark, snapshot_id=1).count() == 10
    assert tbl.snapshot(sid)["props"]["operation"] == "replace"
    # appends continue on top of the compacted snapshot
    d = tbl.new_commit_dir("after")
    f = write_dataframe_files(spark.range(50, 60).toDF("id"), d)
    tbl.commit_append(f)
    assert tbl.read(spark).count() == 60


def test_merge_upsert_latest_wins(spark, tmp_path):
    """MERGE INTO semantics: updates overwrite matched keys (latest
    order_col wins, update wins ties), unmatched keys insert, history
    time-travels to the pre-merge state."""
    tbl = IceliteTable(str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "c", 10)], "k long, v string, ver long")
    tbl.commit_append(write_dataframe_files(base, tbl.new_commit_dir("c0")))

    updates = spark.createDataFrame(
        [(2, "B2", 20),    # newer → replaces
         (3, "stale", 5),  # older → loses to current
         (4, "d", 20)],    # new key → inserts
        "k long, v string, ver long")
    sid = tbl.merge_upsert(spark, updates, key_cols=("k",), order_col="ver")
    got = {r["k"]: (r["v"], r["ver"]) for r in tbl.read(spark).collect()}
    assert got == {1: ("a", 10), 2: ("B2", 20), 3: ("c", 10), 4: ("d", 20)}
    assert tbl.snapshot(sid)["props"]["operation"] == "merge"
    # pre-merge state still time-travelable
    assert {r["k"] for r in tbl.read(spark, snapshot_id=1).collect()} == {1, 2, 3}
    # tie on ver: the update wins
    tbl.merge_upsert(spark, spark.createDataFrame(
        [(1, "A-tie", 10)], "k long, v string, ver long"),
        key_cols=("k",), order_col="ver")
    assert {r["v"] for r in tbl.read(spark).filter("k = 1").collect()} == {"A-tie"}


def test_sorted_compaction_tightens_stats_ranges(spark, tmp_path):
    """compact(sort_by=...) range-clusters the rewrite so per-file
    min/max become disjoint and stats skipping actually skips."""
    import random
    tbl = IceliteTable(str(tmp_path / "tbl"))
    ids = list(range(400))
    random.Random(7).shuffle(ids)
    for c in range(4):  # 4 commits of interleaved ids → full-range files
        chunk = spark.createDataFrame([(i,) for i in ids[c*100:(c+1)*100]],
                                      "id long")
        tbl.commit_append(write_dataframe_files(chunk.coalesce(1),
                                                tbl.new_commit_dir(f"c{c}")),
                          stats_cols=("id",))
    # before: every file spans ~the whole id range → nothing skips
    pre = tbl.snapshot()["files"]
    assert all(e["stats"]["id"][0] < 100 < e["stats"]["id"][1] for e in pre)

    tbl.compact(spark, target_file_bytes=1, sort_by=("id",),
                stats_cols=("id",))  # tiny target → several sorted files
    post = tbl.snapshot()["files"]
    assert len(post) > 1
    ranges = sorted(tuple(e["stats"]["id"]) for e in post)
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2                 # disjoint, clustered ranges
    narrow = tbl.read(spark, stats_filter={"id": (0, 50)})
    assert narrow.count() < 400          # skipping now prunes files
    assert narrow.filter("id <= 50").count() == 51


def test_manifest_column_stats_skip_files(spark, tmp_path):
    """Data-file skipping from manifest min/max stats (Iceberg's
    file-level pruning): commits with disjoint id ranges, a stats
    filter reads only the intersecting files."""
    tbl = IceliteTable(str(tmp_path / "tbl"))
    for i in range(4):
        d = tbl.new_commit_dir(f"c{i}")
        f = write_dataframe_files(
            spark.range(i * 100, i * 100 + 50).toDF("id").coalesce(1), d)
        tbl.commit_append(f, stats_cols=("id",))
    snap = tbl.snapshot()
    assert all("stats" in e and e["stats"]["id"] == [i * 100, i * 100 + 49]
               for i, e in enumerate(snap["files"]))

    # range [120, 130] lives only in commit 1's file
    pruned = tbl.read(spark, stats_filter={"id": (120, 130)})
    assert pruned.count() == 50                       # one file scanned
    assert pruned.filter("id BETWEEN 120 AND 130").count() == 11
    # caller still applies the real predicate; the filter only prunes
    full = tbl.read(spark, stats_filter={"id": (0, 1000)})
    assert full.count() == 200
    # files without stats are conservatively kept
    f = write_dataframe_files(spark.range(900, 910).toDF("id"),
                              tbl.new_commit_dir("nostats"))
    tbl.commit_append(f)  # no stats_cols
    kept = tbl.read(spark, stats_filter={"id": (120, 130)})
    assert kept.count() == 60                         # pruned file + no-stats file


def test_concurrent_appenders_never_lose_updates(spark, tmp_path):
    """Optimistic commits: 8 threads append concurrently; losers of the
    snapshot-id race rebase and retry, so every dataset lands and the
    snapshot chain is contiguous."""
    import threading

    tbl = IceliteTable(str(tmp_path / "tbl"))
    file_sets = []
    for i in range(8):
        d = tbl.new_commit_dir(f"w{i}")
        file_sets.append(write_dataframe_files(
            spark.range(i * 100, i * 100 + 10).toDF("id"), d))

    barrier = threading.Barrier(8)
    errors = []

    def worker(i):
        try:
            barrier.wait()
            tbl.commit_append(file_sets[i], props={"writer": i})
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert [s["snapshot_id"] for s in tbl.snapshots()] == list(range(1, 9))
    got = {r["id"] for r in tbl.read(spark).collect()}
    assert got == {i * 100 + j for i in range(8) for j in range(10)}
    # every snapshot strictly grows its parent's file list (rebase, not
    # overwrite)
    sizes = [len(s["files"]) for s in tbl.snapshots()]
    assert sizes == sorted(sizes) and sizes[-1] == sum(len(f) for f in file_sets)


def test_schema_evolution_additive_column(spark, tmp_path):
    """Additive schema evolution: commit 2 adds a column; merge_schema
    reads see the union schema with nulls for the old files, and
    time travel to snapshot 1 still sees the old schema."""
    from pyspark.sql import functions as F
    tbl = IceliteTable(str(tmp_path / "tbl"))
    f1 = write_dataframe_files(spark.range(5).toDF("id"),
                               tbl.new_commit_dir("c1"))
    tbl.commit_append(f1)
    evolved = spark.range(5, 8).toDF("id").withColumn("score", F.lit(0.5))
    f2 = write_dataframe_files(evolved, tbl.new_commit_dir("c2"))
    tbl.commit_append(f2)

    merged = tbl.read(spark, merge_schema=True)
    assert set(merged.columns) == {"id", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert len(rows) == 8
    assert rows[1] is None and rows[6] == 0.5   # old files null-fill
    assert set(tbl.read(spark, snapshot_id=1).columns) == {"id"}


def test_expire_and_gc_reclaim_precompaction_files(spark, tmp_path):
    """compact → expire_snapshots → remove_orphan_files reclaims the
    pre-compaction storage; the live snapshot is untouched."""
    tbl = IceliteTable(str(tmp_path / "tbl"))
    for i in range(4):
        d = tbl.new_commit_dir(f"c{i}")
        f = write_dataframe_files(
            spark.range(i * 10, (i + 1) * 10).toDF("id").repartition(3), d)
        tbl.commit_append(f)
    # plus a crash-orphaned dir that never reached a manifest
    write_dataframe_files(spark.range(3).toDF("id"),
                          tbl.new_commit_dir("crashed"))

    tbl.compact(spark, target_file_bytes=1 << 30)
    def on_disk():
        return [os.path.join(r, n) for r, _d, fs in
                os.walk(os.path.join(tbl.path, "data")) for n in fs
                if n.endswith(".parquet")]
    disk_before = len(on_disk())

    expired = tbl.expire_snapshots(keep_last=1)
    assert expired == [1, 2, 3, 4]
    assert [s["snapshot_id"] for s in tbl.snapshots()] == [5]

    doomed = tbl.remove_orphan_files(dry_run=True)
    assert doomed  # pre-compaction + crashed files are now orphans
    tbl.remove_orphan_files()
    disk_after = len(on_disk())
    assert disk_after < disk_before
    assert disk_after == len(tbl.file_list())     # exactly the live set
    assert {r["id"] for r in tbl.read(spark).collect()} == set(range(40))
    with pytest.raises(FileNotFoundError):
        tbl.snapshot(2)                            # time travel released


def test_compaction_preserves_bucketed_layout(spark, input_dir, tmp_path):
    out = str(tmp_path / "extracted")
    run_extract(spark, input_dir, out, run_id="r1", partitions=4, max_files=2)
    run_extract(spark, input_dir, out, run_id="r2", partitions=4)
    tbl = IceliteTable(out)
    files_before = len(tbl.file_list())
    from ocrflow.runner import compact_output
    compact_output(spark, out, target_file_bytes=1 << 30)
    files_after = tbl.file_list()
    assert len(files_after) < files_before
    assert all("_cb=" in f for f in files_after)   # hive layout preserved
    full = tbl.read(spark)
    assert full.count() == 300
    # manifest path pruning still works over the compacted layout
    some = full.select("conv_bucket").first()["conv_bucket"]
    pruned = tbl.read(spark, path_filter=f"_cb={some}/")
    assert 0 < pruned.count() < 300


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


# -- round 3: delete_where, timestamp travel, validated rewrites ----------

def test_delete_where_cow_rewrites_only_touched_files(spark, tmp_path):
    """Row-level DELETE (COW): only files whose stats may contain
    matches are rewritten; untouched entries carry over verbatim, the
    pre-delete snapshot still time-travels to the deleted rows, and GC
    after expiry reclaims the rewritten file."""
    from ocrflow.icelite import IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    for i in range(3):
        f = write_dataframe_files(
            spark.range(i * 100, i * 100 + 50).toDF("id").coalesce(1),
            tbl.new_commit_dir(f"c{i}"))
        tbl.commit_append(f, stats_cols=("id",))
    pre = tbl.current_snapshot_id()
    untouched_before = {e["path"] for e in tbl.snapshot(pre)["files"]
                        if e["stats"]["id"][0] >= 100}

    sid = tbl.delete_where(spark, "id BETWEEN 20 AND 29",
                           stats_hint={"id": (20, 29)},
                           stats_cols=("id",))
    snap = tbl.snapshot(sid)
    assert snap["props"]["files_rewritten"] == 1
    assert snap["props"]["files_kept"] == 2
    # untouched entries carried over exactly (same paths, stats intact)
    assert untouched_before <= {e["path"] for e in snap["files"]}
    got = {r["id"] for r in tbl.read(spark).collect()}
    assert got == ({*range(0, 20), *range(30, 50),
                    *range(100, 150), *range(200, 250)})
    # history preserved: pre-delete snapshot still reads the rows
    old = {r["id"] for r in tbl.read(spark, snapshot_id=pre).collect()}
    assert {*range(20, 30)} <= old
    # erasure completes via expiry + GC
    tbl.expire_snapshots(keep_last=1)
    removed = tbl.remove_orphan_files()
    assert any("/c0/" in p for p in removed)      # rewritten source file gone
    assert {r["id"] for r in tbl.read(spark).collect()} == got


def test_delete_where_null_predicate_keeps_nulls(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate is NULL are
    kept, not deleted."""
    from pyspark.sql import functions as F
    from ocrflow.icelite import IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 50)], "id int, v int")
    tbl.commit_append(write_dataframe_files(df, tbl.new_commit_dir("c0")))
    tbl.delete_where(spark, F.col("v") > 10)
    got = {r["id"] for r in tbl.read(spark).collect()}
    assert got == {1, 2}                           # NULL row kept


def test_delete_where_noop_when_stats_prove_untouched(spark, tmp_path):
    from ocrflow.icelite import IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    f = write_dataframe_files(spark.range(0, 50).toDF("id").coalesce(1),
                              tbl.new_commit_dir("c0"))
    tbl.commit_append(f, stats_cols=("id",))
    before = tbl.current_snapshot_id()
    sid = tbl.delete_where(spark, "id BETWEEN 900 AND 999",
                           stats_hint={"id": (900, 999)})
    assert sid == before                           # no new snapshot


def test_read_as_of_timestamp(spark, tmp_path):
    from ocrflow.icelite import IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    import pytest as _pytest
    tbl.commit_append(write_dataframe_files(
        spark.range(0, 10).toDF("id"), tbl.new_commit_dir("c0")))
    t1 = tbl.snapshot()["committed_at"]
    tbl.commit_append(write_dataframe_files(
        spark.range(10, 20).toDF("id"), tbl.new_commit_dir("c1")))
    t2 = tbl.snapshot()["committed_at"]
    # at t1 (inclusive): only the first commit
    assert tbl.read(spark, as_of_ts=t1).count() == 10
    assert tbl.read(spark, as_of_ts=(t1 + t2) / 2).count() == 10
    assert tbl.read(spark, as_of_ts=t2 + 1).count() == 20
    with _pytest.raises(ValueError):
        tbl.read(spark, as_of_ts=t1 - 1)           # older than the table
    with _pytest.raises(ValueError):
        tbl.read(spark, snapshot_id=1, as_of_ts=t1)  # mutually exclusive


def test_replace_aborts_on_concurrent_append(spark, tmp_path):
    """commit_replace(validate_from=...) must NOT drop a concurrent
    append: the head moved since the rewrite's source snapshot, so the
    commit aborts and the append's rows survive."""
    import pytest as _pytest
    from ocrflow.icelite import CommitConflictError, IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    tbl.commit_append(write_dataframe_files(
        spark.range(0, 10).toDF("id"), tbl.new_commit_dir("c0")))
    src = tbl.current_snapshot_id()
    rewrite = write_dataframe_files(
        tbl.read(spark).coalesce(1), tbl.new_commit_dir("rw"))
    # a concurrent append wins while the rewrite was running
    tbl.commit_append(write_dataframe_files(
        spark.range(100, 110).toDF("id"), tbl.new_commit_dir("c1")))
    with _pytest.raises(CommitConflictError):
        tbl.commit_replace(rewrite, validate_from=src)
    got = {r["id"] for r in tbl.read(spark).collect()}
    assert {*range(100, 110)} <= got               # append not lost


def test_delete_where_aborts_on_concurrent_append(spark, tmp_path, monkeypatch):
    import pytest as _pytest
    from ocrflow import icelite as I
    tbl = I.IceliteTable(str(tmp_path / "tbl"))
    tbl.commit_append(write_dataframe_files(
        spark.range(0, 10).toDF("id"), tbl.new_commit_dir("c0")))

    orig = I.write_dataframe_files

    def racy_write(df, out_dir, partition_by=()):
        files = orig(df, out_dir, partition_by)
        # another writer lands between the rewrite and the commit
        tbl.commit_append(orig(spark.range(50, 60).toDF("id"),
                               tbl.new_commit_dir("race")))
        return files
    monkeypatch.setattr(I, "write_dataframe_files", racy_write)
    with _pytest.raises(I.CommitConflictError):
        tbl.delete_where(spark, "id < 5")
    got = {r["id"] for r in tbl.read(spark).collect()}
    assert {*range(50, 60)} <= got and {*range(0, 10)} <= got


def test_read_pruned_to_zero_returns_empty_with_schema(spark, tmp_path):
    import pytest as _pytest
    from ocrflow.icelite import IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    f = write_dataframe_files(spark.range(0, 50).toDF("id").coalesce(1),
                              tbl.new_commit_dir("c0"))
    tbl.commit_append(f, stats_cols=("id",))
    empty = tbl.read(spark, stats_filter={"id": (10_000, 20_000)})
    assert empty.count() == 0
    assert empty.columns == ["id"]                 # schema, not an error
    empty2 = tbl.read(spark, path_filter="no-such-dir/")
    assert empty2.count() == 0
    # a snapshot with NO files at all is still an error
    bare = IceliteTable(str(tmp_path / "bare"))
    bare.commit_append([])
    with _pytest.raises(ValueError):
        bare.read(spark)


def test_loser_rebases_onto_unpointed_manifest(spark, tmp_path):
    """The rebase parent comes from the max committed manifest, not
    CURRENT: a winner that claimed snap-1 but hasn't advanced the
    pointer yet must not stall a second writer."""
    import json as _json
    from ocrflow.icelite import IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    f1 = write_dataframe_files(spark.range(0, 10).toDF("id"),
                               tbl.new_commit_dir("c0"))
    # simulate the claim-but-not-yet-pointed window by hand
    manifest = {"snapshot_id": 1, "parent_id": None, "committed_at": 0.0,
                "files": [{"path": os.path.relpath(p, tbl.path),
                           "rows": 10} for p in f1], "props": {}}
    with open(os.path.join(tbl.meta_dir, "snap-1.json"), "w") as fh:
        _json.dump(manifest, fh)
    assert tbl.current_snapshot_id() is None       # pointer lags
    f2 = write_dataframe_files(spark.range(10, 20).toDF("id"),
                               tbl.new_commit_dir("c1"))
    sid = tbl.commit_append(f2)
    assert sid == 2                                # rebased onto snap-1
    assert tbl.snapshot(2)["parent_id"] == 1
    assert tbl.read(spark).count() == 20           # both writers' rows live


# -- round 3b: merge-on-read deletes --------------------------------------

def test_mor_delete_hides_rows_and_time_travels(spark, tmp_path):
    from ocrflow.icelite import IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    tbl.commit_append(write_dataframe_files(
        spark.range(0, 50).toDF("id").coalesce(1), tbl.new_commit_dir("c0")))
    pre = tbl.current_snapshot_id()
    sid = tbl.delete_where_mor(spark, "id BETWEEN 10 AND 19",
                               key_cols=("id",))
    # metadata-only commit: data file list unchanged
    assert ({e["path"] for e in tbl.snapshot(sid)["files"]}
            == {e["path"] for e in tbl.snapshot(pre)["files"]})
    got = {r["id"] for r in tbl.read(spark).collect()}
    assert got == {*range(0, 10), *range(20, 50)}
    # pre-delete snapshot unaffected
    assert len({r["id"] for r in tbl.read(spark, snapshot_id=pre).collect()}) == 50


def test_mor_delete_append_after_resurrects_new_rows_only(spark, tmp_path):
    """Iceberg sequence-number semantics: a key appended AFTER the
    delete is visible; the originally-deleted row stays hidden."""
    from ocrflow.icelite import IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame([(1, "old"), (2, "old")], "id int, v string")
    tbl.commit_append(write_dataframe_files(df, tbl.new_commit_dir("c0")))
    tbl.delete_where_mor(spark, "id = 1", key_cols=("id",))
    tbl.commit_append(write_dataframe_files(
        spark.createDataFrame([(1, "new")], "id int, v string"),
        tbl.new_commit_dir("c1")))
    got = {(r["id"], r["v"]) for r in tbl.read(spark).collect()}
    assert got == {(2, "old"), (1, "new")}    # old (1,'old') hidden


def test_mor_delete_stacking_and_compact_materializes(spark, tmp_path):
    from ocrflow.icelite import IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    tbl.commit_append(write_dataframe_files(
        spark.range(0, 40).toDF("id").coalesce(1), tbl.new_commit_dir("c0")))
    tbl.delete_where_mor(spark, "id < 5", key_cols=("id",))
    tbl.delete_where_mor(spark, "id >= 35", key_cols=("id",))
    assert len(tbl.snapshot()["delete_files"]) == 2   # stacked
    expect = {*range(5, 35)}
    assert {r["id"] for r in tbl.read(spark).collect()} == expect
    # COW delete refuses to run under pending MOR deletes
    import pytest as _pytest
    with _pytest.raises(ValueError, match="merge-on-read"):
        tbl.delete_where(spark, "id = 20")
    # compact materializes: delete entries gone, rows still hidden
    sid = tbl.compact(spark)
    assert "delete_files" not in tbl.snapshot(sid)
    assert {r["id"] for r in tbl.read(spark).collect()} == expect
    # ...and now COW delete works again
    tbl.delete_where(spark, "id = 20")
    assert 20 not in {r["id"] for r in tbl.read(spark).collect()}


def test_mor_delete_files_survive_gc_until_expired(spark, tmp_path):
    from ocrflow.icelite import IceliteTable
    tbl = IceliteTable(str(tmp_path / "tbl"))
    tbl.commit_append(write_dataframe_files(
        spark.range(0, 20).toDF("id").coalesce(1), tbl.new_commit_dir("c0")))
    tbl.delete_where_mor(spark, "id = 3", key_cols=("id",))
    removed = tbl.remove_orphan_files()
    # only write markers swept; the delete file (and data) are LIVE
    assert not [p for p in removed if p.endswith(".parquet")]
    assert {r["id"] for r in tbl.read(spark).collect()} == {*range(0, 20)} - {3}
    tbl.compact(spark)
    tbl.expire_snapshots(keep_last=1)
    removed = tbl.remove_orphan_files()
    assert any("mordelete-" in p for p in removed)   # reclaimed after expiry
    assert {r["id"] for r in tbl.read(spark).collect()} == {*range(0, 20)} - {3}


def test_schema_evolution_manifest_planned_three_commits(spark, tmp_path):
    """Manifest-planned evolution: three commits with successively
    added columns read as the full union WITHOUT parquet mergeSchema
    (signatures come from the manifest); column order follows commit
    order (added columns append); stripping the recorded signatures
    from the manifest (pre-signature table) falls back to parquet
    mergeSchema with identical results."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    tbl = IceliteTable(str(tmp_path / "tbl"))
    tbl.commit_append(write_dataframe_files(
        spark.range(3).toDF("id"), tbl.new_commit_dir("c1")))
    tbl.commit_append(write_dataframe_files(
        spark.range(3, 6).toDF("id").withColumn("score", F.lit(1.5)),
        tbl.new_commit_dir("c2")))
    tbl.commit_append(write_dataframe_files(
        spark.range(6, 9).toDF("id").withColumn("score", F.lit(2.5))
        .withColumn("tag", F.lit("x")), tbl.new_commit_dir("c3")))

    snap = tbl.snapshot()
    assert all("schema" in e for e in snap["files"])

    merged = tbl.read(spark, merge_schema=True)
    assert merged.columns == ["id", "score", "tag"]   # append order
    rows = {r["id"]: (r["score"], r["tag"]) for r in merged.collect()}
    assert len(rows) == 9
    assert rows[0] == (None, None)
    assert rows[4] == (1.5, None)
    assert rows[8] == (2.5, "x")

    # pre-signature manifest → fallback path, same data
    p = _os.path.join(tbl.meta_dir, f"snap-{snap['snapshot_id']}.json")
    for e in snap["files"]:
        e.pop("schema", None)
    with open(p, "w") as fh:
        _json.dump(snap, fh)
    legacy = tbl.read(spark, merge_schema=True)
    lrows = {r["id"]: (r["score"], r["tag"]) for r in legacy.collect()}
    assert lrows == rows


def test_zorder_compaction_prunes_2d_box(spark, tmp_path):
    """Z-order rewrite vs linear sort: for a 2-D box query, the
    Z-clustered layout's manifest stats prune MORE files than a
    single-column sort (which covers only its own dimension), and both
    layouts return identical query results."""
    from pyspark.sql import functions as F

    from ocrflow.icelite import zorder_bucket, zorder_expr

    df = spark.range(4096).select(
        (F.col("id") % 64).alias("user_id"),
        ((F.col("id") * 2654435761) % 4096).alias("metric"))

    def build(sort_linear: bool):
        tbl = IceliteTable(str(tmp_path / ("lin" if sort_linear else "zord")))
        tbl.commit_append(write_dataframe_files(
            df.repartition(8), tbl.new_commit_dir("seed")))
        if sort_linear:
            tbl.compact(spark, target_file_bytes=4 << 10,
                        sort_by=("metric",),
                        stats_cols=("user_id", "metric"))
        else:
            z = zorder_expr([zorder_bucket(F.col("user_id"), 0, 63, 6),
                             zorder_bucket(F.col("metric"), 0, 4095, 6)],
                            bits=6)
            tbl.compact(spark, target_file_bytes=4 << 10,
                        derive={"_z": z}, sort_by=("_z",),
                        stats_cols=("user_id", "metric"))
        return tbl

    lin, zord = build(True), build(False)
    # tight on user_id, loose on metric: the metric-sorted layout can
    # prune only via the loose dimension; Z-order prunes via both
    box = {"user_id": (0, 7), "metric": (0, 2047)}
    kept_lin = len(lin.read(spark, stats_filter=box).inputFiles())
    kept_z = len(zord.read(spark, stats_filter=box).inputFiles())
    n_files_lin = len(lin.file_list())
    n_files_z = len(zord.file_list())
    assert n_files_lin > 4 and n_files_z > 4      # enough files to prune
    assert kept_z < kept_lin, (kept_z, kept_lin)  # Z prunes both dims

    pred = ((F.col("user_id").between(0, 7))
            & (F.col("metric").between(0, 2047)))
    rows_lin = sorted((r["user_id"], r["metric"]) for r in
                      lin.read(spark, stats_filter=box).filter(pred).collect())
    rows_z = sorted((r["user_id"], r["metric"]) for r in
                    zord.read(spark, stats_filter=box).filter(pred).collect())
    exact = sorted((r["user_id"], r["metric"]) for r in
                   df.filter(pred).collect())
    assert rows_lin == rows_z == exact


def test_stale_current_lock_is_reclaimed(spark, tmp_path):
    """A CURRENT.lock left behind by a crashed holder must not degrade
    every later commit to the ~2s unlocked fallback: the next
    _advance_current waiter reclaims it once it looks stale (mtime
    older than _LOCK_STALE_SECS), commits promptly, and leaves no lock
    behind (ADVICE r03, medium)."""
    import os
    import time as _time
    from ocrflow.icelite import IceliteTable, _LOCK_STALE_SECS
    tbl = IceliteTable(str(tmp_path / "tbl"))
    tbl.commit_append(write_dataframe_files(
        spark.range(0, 10).toDF("id").coalesce(1), tbl.new_commit_dir("c0")))
    # simulate a crashed holder: orphan lock with an old mtime
    lock = os.path.join(tbl.meta_dir, "CURRENT.lock")
    with open(lock, "w") as fh:
        fh.write("999")
    old = _time.time() - (_LOCK_STALE_SECS + 10)
    os.utime(lock, (old, old))
    t0 = _time.monotonic()
    tbl.commit_append(write_dataframe_files(
        spark.range(10, 20).toDF("id").coalesce(1), tbl.new_commit_dir("c1")))
    took = _time.monotonic() - t0
    # pre-fix behavior always spins the full 2000x1ms ≈ 2.0s, so any
    # sub-1.9s commit proves the reclaim fired (bound is load-tolerant)
    assert took < 1.9, f"stale lock stalled the commit: {took:.2f}s"
    assert not os.path.exists(lock)                # mutex self-healed
    assert tbl.read(spark).count() == 20


def test_manifest_planning_stays_cheap_at_1e5_entries(spark, tmp_path):
    """Iceberg-model scale contract: snapshot planning is a DRIVER-side
    walk of the manifest (no footer I/O), so a 10^5-entry manifest must
    load + stats-prune in well under a second of pure-Python work and
    read() must scan only the surviving files. Built by fabricating a
    manifest around 8 real files + 99,992 synthetic entries whose
    recorded id-ranges are disjoint from the probe box (the
    list_input_files/read seam the runner uses; BENCH/r04_notes.md
    records the measured timings)."""
    import time as _time
    tbl = IceliteTable(str(tmp_path / "tbl"))
    real = write_dataframe_files(
        spark.range(0, 80).toDF("id").repartition(8), tbl.new_commit_dir("c0"))
    tbl.commit_append(real, stats_cols=("id",))
    snap = tbl.snapshot()
    real_entries = snap["files"]
    assert len(real_entries) == 8 and all("stats" in e for e in real_entries)
    fake = [{"path": f"data/fake/f{i}.parquet", "rows": 1000,
             "schema": ["id"], "stats": {"id": [10_000 + i, 10_000 + i]}}
            for i in range(99_992)]
    snap["files"] = fake + real_entries
    snap["snapshot_id"] = 2
    with open(os.path.join(tbl.meta_dir, "snap-2.json"), "w") as fh:
        json.dump(snap, fh)
    tbl._atomic_write(os.path.join(tbl.meta_dir, "CURRENT"), "snap-2.json")

    t0 = _time.monotonic()
    files = tbl.file_list()                     # JSON load of 1e5 entries
    t_list = _time.monotonic() - t0
    assert len(files) == 100_000

    t0 = _time.monotonic()
    df = tbl.read(spark, stats_filter={"id": (0, 79)})   # prune 1e5 -> 8
    t_plan = _time.monotonic() - t0             # planning only (lazy scan)
    assert len(df.inputFiles()) == 8
    assert df.count() == 80
    # generous load-tolerant bounds; quiet-machine numbers land ~0.2s/.4s
    assert t_list < 5.0, f"file_list took {t_list:.2f}s on 1e5 entries"
    assert t_plan < 5.0, f"read() planning took {t_plan:.2f}s on 1e5 entries"
    print(f"manifest-1e5: file_list {t_list:.3f}s, read-plan {t_plan:.3f}s")


def test_rollback_restores_state_and_survives_next_commit(spark, tmp_path):
    """rollback(sid): CURRENT returns to the old snapshot, later
    manifests are expired (else the optimistic-commit rebase would
    silently re-win off the newer manifest), reads are byte-identical
    to the original state, and the NEXT commit builds on the
    rolled-back state, not the undone one."""
    tbl = IceliteTable(str(tmp_path / "tbl"))
    s1 = tbl.commit_append(write_dataframe_files(
        spark.range(0, 10).toDF("id").coalesce(1), tbl.new_commit_dir("c0")))
    tbl.commit_append(write_dataframe_files(
        spark.range(10, 99).toDF("id").coalesce(1), tbl.new_commit_dir("bad")))
    assert tbl.read(spark).count() == 99
    assert tbl.rollback(s1) == s1
    assert tbl.current_snapshot_id() == s1
    assert {r["id"] for r in tbl.read(spark).collect()} == set(range(10))
    # next commit forks from the rolled-back state
    tbl.commit_append(write_dataframe_files(
        spark.range(100, 105).toDF("id").coalesce(1),
        tbl.new_commit_dir("c2")))
    got = {r["id"] for r in tbl.read(spark).collect()}
    assert got == set(range(10)) | set(range(100, 105))  # no 'bad' rows
    # the undone data files are reclaimable
    orphans = tbl.remove_orphan_files(dry_run=True)
    assert orphans, "undone commit's files should be orphaned"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tbl.rollback(999)


def test_partition_evolution_daily_to_monthly_layouts(spark, tmp_path):
    """PARTITION EVOLUTION (Iceberg's spec-evolution semantics): era-1
    commits land hive-partitioned by DAY, era-2 commits by MONTH, in
    the SAME table. Reads must (a) return the union transparently and
    (b) prune across BOTH layouts for a time predicate — via the
    commit-time ts stats, which are layout-independent (the runner's
    derived-partition-column pattern keeps ts in the data files)."""
    from pyspark.sql import functions as F

    from ocrflow.icelite import IceliteTable, write_dataframe_files

    tbl = IceliteTable(str(tmp_path / "tbl"))
    base = spark.range(0, 240).select(
        F.col("id").alias("event_id"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(hours=F.col("id").cast("int"))).alias("ts"))

    era1 = (base.filter(F.col("ts") < "2024-01-06")
            .withColumn("_day", F.to_date("ts")))
    f1 = write_dataframe_files(era1, tbl.new_commit_dir("daily"),
                               partition_by=("_day",))
    tbl.commit_append(f1, stats_cols=("ts",))

    era2 = (base.filter(F.col("ts") >= "2024-01-06")
            .withColumn("_month", F.date_format("ts", "yyyy-MM")))
    f2 = write_dataframe_files(era2, tbl.new_commit_dir("monthly"),
                               partition_by=("_month",))
    tbl.commit_append(f2, stats_cols=("ts",))

    # (a) the full read unions both layouts with one schema
    full = tbl.read(spark)
    assert full.count() == 240
    assert set(full.columns) == {"event_id", "ts"}

    # (b) a one-day window prunes across BOTH layouts via ts stats:
    # era-1 keeps exactly the matching day directory's files, era-2
    # keeps only the (single) monthly file covering the day
    lo, hi = "2024-01-03T00:00:00", "2024-01-03T23:59:59"
    pruned = tbl.read(spark, stats_filter={"ts": (lo, hi)})
    got = (pruned.filter((F.col("ts") >= "2024-01-03")
                         & (F.col("ts") < "2024-01-04"))
           .select("event_id").collect())
    assert sorted(r.event_id for r in got) == list(range(48, 72))

    # file-level evidence: recompute the manifest prune the way read()
    # does and check the day query touches far fewer files than exist
    snap = tbl.snapshot()
    ents = snap["files"]
    kept = [e for e in ents
            if "ts" not in e.get("stats", {})
            or not (e["stats"]["ts"][1] < lo or e["stats"]["ts"][0] > hi)]
    kept_daily = [e for e in kept if "_day=" in e["path"]]
    kept_monthly = [e for e in kept if "_month=" in e["path"]]
    all_daily = [e for e in ents if "_day=" in e["path"]]
    assert all(e["path"].count("_day=2024-01-03") for e in kept_daily)
    assert len(kept_daily) < len(all_daily)
    # the whole era-2 range starts Jan-6, so every monthly file prunes
    assert kept_monthly == []

    # and the mirror query on an era-2 day prunes every daily file
    lo2, hi2 = "2024-01-08T00:00:00", "2024-01-08T23:59:59"
    got2 = (tbl.read(spark, stats_filter={"ts": (lo2, hi2)})
            .filter((F.col("ts") >= "2024-01-08")
                    & (F.col("ts") < "2024-01-09"))
            .select("event_id").collect())
    assert sorted(r.event_id for r in got2) == list(range(168, 192))
    kept2 = [e for e in ents
             if "ts" not in e.get("stats", {})
             or not (e["stats"]["ts"][1] < lo2 or e["stats"]["ts"][0] > hi2)]
    assert [e for e in kept2 if "_day=" in e["path"]] == []
    assert all("_month=2024-01" in e["path"]
               for e in kept2 if "_month=" in e["path"])
    assert any("_month=" in e["path"] for e in kept2)


def test_icelite_incremental_read(spark, tmp_path):
    """Incremental append scan: file-set diff between snapshots, with
    the append-only contract enforced (replace/compaction and MOR
    deletes in the range must raise, empty range yields an empty
    frame with the table schema)."""
    from ocrflow.icelite import IceliteTable, write_dataframe_files

    tbl = IceliteTable(str(tmp_path / "tbl"))
    for lo, hi in ((0, 10), (10, 25), (25, 30)):
        fs = write_dataframe_files(
            spark.range(lo, hi).toDF("id"), tbl.new_commit_dir())
        tbl.commit_append(fs)

    inc = tbl.incremental_read(spark, from_snapshot_id=1,
                               to_snapshot_id=3)
    assert sorted(r.id for r in inc.collect()) == list(range(10, 30))
    # single-commit slice
    assert tbl.incremental_read(spark, 2, 3).count() == 5
    # empty range = same snapshot on both ends: empty frame, schema kept
    empty = tbl.incremental_read(spark, 3, 3)
    assert empty.count() == 0 and empty.columns == ["id"]
    with pytest.raises(ValueError, match="to < from"):
        tbl.incremental_read(spark, 3, 1)
    # a compaction breaks the append-only file-set contract
    tbl.compact(spark)
    with pytest.raises(ValueError, match="replace/compaction"):
        tbl.incremental_read(spark, 1, tbl.current_snapshot_id())
    # MOR deletes in the range are equally non-append
    from pyspark.sql import functions as F
    tbl.delete_where_mor(spark, F.col("id") == 7, key_cols=("id",))
    with pytest.raises(ValueError, match="merge-on-read"):
        tbl.incremental_read(spark, 1, tbl.current_snapshot_id())


def test_icelite_named_refs(spark, tmp_path):
    """Named refs: read(ref=), atomic moves, selector exclusivity,
    and the Iceberg tag-retention rule (refs protect snapshots from
    expire_snapshots)."""
    from ocrflow.icelite import IceliteTable, write_dataframe_files

    tbl = IceliteTable(str(tmp_path / "tbl"))
    for lo, hi in ((0, 5), (5, 12), (12, 20)):
        fs = write_dataframe_files(
            spark.range(lo, hi).toDF("id"), tbl.new_commit_dir())
        tbl.commit_append(fs)
    tbl.set_ref("published", 1)
    assert tbl.read(spark, ref="published").count() == 5
    tbl.set_ref("published", 2)                      # ref move
    assert tbl.read(spark, ref="published").count() == 12
    with pytest.raises(ValueError, match="unknown ref"):
        tbl.read(spark, ref="nope")
    with pytest.raises(ValueError, match="at most one"):
        tbl.read(spark, snapshot_id=1, ref="published")
    with pytest.raises(ValueError, match="unknown snapshot"):
        tbl.set_ref("x", 99)
    # tag retention: snapshot 1 is NOT ref'd → expired; 2 is ref'd → kept
    expired = tbl.expire_snapshots(keep_last=1)
    assert expired == [1]
    assert tbl.read(spark, ref="published").count() == 12
    # dropping the ref releases it for the next expiry pass
    tbl.drop_ref("published")
    assert tbl.expire_snapshots(keep_last=1) == [2]
