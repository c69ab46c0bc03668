"""Behavioral tests for the training-data ops (planted fixtures)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

import ocrflow.dataops as D

SF_DIR = os.environ.get("OCRFLOW_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_minhash_lsh_finds_planted_near_dup(spark):
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = src.filter("doc_id = 7").first()
    words = one["text"].split()
    words[3] = "REPLACED"
    planted = spark.createDataFrame(
        [(99991, " ".join(words), one["lang"], one["source"],
          len(one["text"]))], src.schema)
    tmp = tempfile.mkdtemp(prefix="ocrflow_lsh_")
    src.unionByName(planted).write.parquet(os.path.join(tmp, "documents.parquet"))
    pairs = {(r["doc_a"], r["doc_b"])
             for r in D.dedup_minhash_lsh(spark, tmp).collect()}
    assert (7, 99991) in pairs


def test_exact_dedup_finds_planted_copy(spark):
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    one = src.filter("doc_id = 3").first()
    planted = spark.createDataFrame(
        [(88888, one["text"], one["lang"], one["source"], one["n_chars"])],
        src.schema)
    tmp = tempfile.mkdtemp(prefix="ocrflow_dex_")
    src.unionByName(planted).write.parquet(os.path.join(tmp, "documents.parquet"))
    dups = {r["keep_id"]: r["n_dups"]
            for r in D.dedup_exact(spark, tmp).collect()}
    assert dups[3] == 2  # original kept (min doc_id), copy counted


def test_ann_lsh_recall_vs_bruteforce(spark):
    bf = {(r["query_id"], r["neighbor_id"])
          for r in D.ann_bruteforce_cosine(spark, SF_DIR).collect()}
    lsh = {(r["query_id"], r["neighbor_id"])
           for r in D.ann_lsh_bucketed(spark, SF_DIR).collect()}
    assert bf
    assert len(bf & lsh) / len(bf) >= 0.6


def test_simhash_near_dup_same_bucket(spark):
    # a doc and its 1-word variant land in the same 16-bit prefix bucket
    from ocrflow.dataops import hash_str64
    import numpy as np

    def simhash(text):
        toks = text.split()
        hs = np.array([hash_str64(tok) for tok in toks], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        sh = np.uint64(0)
        for b in np.flatnonzero(votes > 0):
            sh |= np.uint64(1) << np.uint64(b)
        return int(sh >> np.uint64(48))

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    variant = base.replace("fox", "cat")
    assert simhash(base) == simhash(variant)


def test_text_analysis_sanity(spark):
    q = D.QUERIES
    lang = {r["doc_id"]: r["lang_pred"]
            for r in q["text_lang_id"](spark, SF_DIR).collect()}
    assert set(lang.values()) <= {"cjk", "latin", "other"}
    qual = q["text_quality_score"](spark, SF_DIR).collect()
    assert all(0 <= r["stopword_ratio"] <= 1.0 for r in qual)
    assert all(r["n_word"] > 0 for r in qual)
    fp = q["text_fingerprint"](spark, SF_DIR).collect()
    assert all(len(r["fingerprint"]) == 32 for r in fp)


def test_multimodal_plumbing(spark):
    import ocrflow.multimodal as M
    meta = M.mm_metadata(spark, SF_DIR).collect()
    assert meta and all(len(r["sha1"]) == 40 for r in meta)
    imgs = [r for r in meta if r["kind"] == "image"]
    assert imgs and all(r["decoded_units"] > 0 for r in imgs)

    rz = M.mm_resize(spark, SF_DIR).collect()
    assert rz and all(r["thumb_px"] == 256 for r in rz)

    fs = M.mm_frame_sample(spark, SF_DIR)
    rows = fs.collect()
    assert rows and all(r["frame_idx"] % 5 == 0 for r in rows)
    # row expansion: more frame rows than video assets
    n_videos = M.make_assets(spark, SF_DIR).filter("kind = 'video'").count()
    assert len(rows) >= n_videos

    # the stub is honest: asking for a real codec raises NotImplementedError
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        M._decode_image(b"xx", 4, 4, real_codec=True)


def test_iter_pagerank_converges(spark):
    import ocrflow.dataops as D
    rows = D.QUERIES["iter_pagerank"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)
    # rank mass conservation-ish: top ranks exceed the teleport floor
    assert ranks[0] > 0.15
