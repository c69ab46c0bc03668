"""Skew handling test (SURVEY.md §5.6): one monster conversation among
many small ones; salting must (a) not change bytes, (b) spread the
monster across tasks so no task processes a pathological share."""

from ocrflow import reference as R
from ocrflow import synth
from ocrflow.pipeline import extract_df
from ocrflow.runner import _ListAccum


def test_salted_monster_conv(spark):
    # ~3000 turns, one conv holding ~1/3 of them
    rows = synth.gen_rows(3000, seed=42, monster_every=5, monster_size=1000)
    from collections import Counter
    sizes = Counter(r["conv_id"] for r in rows)
    monster_share = max(sizes.values()) / len(rows)
    assert monster_share > 0.25, "fixture must actually be skewed"

    df = spark.createDataFrame(rows, schema=synth.TRANSCRIPTS_DDL)
    P = 12

    def task_rows(salt_buckets):
        acc = spark.sparkContext.accumulator([], _ListAccum())
        out = extract_df(spark, df, partitions=P, salt_buckets=salt_buckets,
                         lineage_acc=acc)
        texts = {(r["conv_id"], r["turn_idx"]): r["extracted_text"]
                 for r in out.collect()}
        return texts, sorted((r[2] for r in acc.value), reverse=True)

    unsalted_texts, unsalted = task_rows(salt_buckets=1)
    salted_texts, salted = task_rows(salt_buckets=8)

    # (a) identical bytes regardless of salting
    assert salted_texts == unsalted_texts
    golden = {(r["conv_id"], r["turn_idx"]):
              R.extract_turn(r["text"], role=r["role"]).extracted_text
              for r in rows}
    assert salted_texts == golden

    # (b) salting caps the hottest task: unsalted puts the whole monster
    # in one task; salted spreads it over ~8
    mean = len(rows) / P
    assert unsalted[0] >= 1000          # monster lands in one task
    assert salted[0] < unsalted[0] / 2  # hot task at least halved
    # bucket→partition collisions add variance; 2.5x mean is the bound
    # the salting guarantees with 8 buckets over 12 partitions
    assert salted[0] <= 2.5 * mean
