"""BPE tokenizer: trainer determinism, applier/trainer agreement,
round-trip safety, and the distributed apply vs a driver recompute."""

import pyspark.sql.functions as F

from ocrflow.bpe import (
    WORD_END,
    _merge_in_word,
    _word_symbols,
    segment_word,
    train_merges_from_counts,
)

SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_sennrich_first_merges_hand_derived():
    # the canonical corpus from the BPE paper; first five merges are
    # hand-computable: es(9) -> est(9) -> est</w>(9) -> lo(7) -> low(7)
    merges = train_merges_from_counts(SENNRICH, 5)
    assert merges == [("e", "s"), ("es", "t"), ("est", WORD_END),
                      ("l", "o"), ("lo", "w")]


def test_segment_lowest_uses_learned_subwords():
    ranks = {p: i for i, p in enumerate(train_merges_from_counts(SENNRICH, 5))}
    assert segment_word("lowest", ranks) == ("low", "est" + WORD_END)


def test_applier_reproduces_trainer_segmentation():
    # trainer = replay merges in rank order; applier = merge the
    # lowest rank present each step. They must agree on every
    # training word (the property that makes apply-time tokenization
    # consistent with the statistics training optimized).
    merges = train_merges_from_counts(SENNRICH, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in SENNRICH:
        sym = _word_symbols(w)
        for a, b in merges:
            sym = _merge_in_word(sym, (a, b), a + b)
        assert segment_word(w, ranks) == sym


def test_segmentation_roundtrip_and_overlap_rule():
    merges = train_merges_from_counts({"aaa": 3, "aaaa": 2, "ab": 5}, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["aaa", "aaaa", "ab", "aab", "abab", "banana"]:
        sym = segment_word(w, ranks)
        assert "".join(sym) == w + WORD_END  # lossless
        assert 1 <= len(sym) <= len(w) + 1


def test_merge_in_word_is_left_to_right_non_overlapping():
    assert _merge_in_word(("a", "a", "a"), ("a", "a"), "aa") == ("aa", "a")
    assert _merge_in_word(("a", "a", "a", "a"), ("a", "a"), "aa") == ("aa", "aa")


def test_spark_bpe_keys_deterministic_and_consistent(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    Q = E.queries()

    m1 = [tuple(r) for r in Q["bpe_train_merges"](spark, sf).collect()]
    m2 = [tuple(r) for r in Q["bpe_train_merges"](spark, sf).collect()]
    assert m1 == m2 and len(m1) == 40
    assert all(r[1] + r[2] == r[3] for r in m1)  # merged == left+right

    stats = {r["lang"]: r for r in Q["text_bpe_tokens"](spark, sf).collect()}
    assert stats and all(r["n_tokens"] >= r["n_words"] >= 0
                         for r in stats.values())

    # the distributed mapInPandas apply equals a driver-side recompute
    # with the same merge table (end-to-end kernel equivalence)
    from ocrflow.bpe import MAX_WORD_CHARS, train_bpe

    ranks = {p: i for i, p in enumerate(train_bpe(spark, sf, 40))}
    docs = (spark.read.parquet(f"{sf}/documents.parquet")
            .filter(F.col("text").isNotNull())
            .select("lang", "text").collect())
    want: dict[str, int] = {}
    for r in docs:
        n = sum(len(segment_word(w, ranks))
                for w in str(r["text"]).lower().split()
                if w and len(w) <= MAX_WORD_CHARS)
        want[r["lang"]] = want.get(r["lang"], 0) + n
    got = {lang: r["n_tokens"] for lang, r in stats.items()}
    assert got == want


# --- property tests (hypothesis): random corpora, not just fixtures ---

try:
    from hypothesis import given, settings, strategies as st

    _word = st.text(alphabet="abcde", min_size=1, max_size=8)
    _corpus = st.dictionaries(_word, st.integers(min_value=1, max_value=9),
                              min_size=1, max_size=12)

    @given(_corpus, st.integers(min_value=0, max_value=25))
    @settings(max_examples=60, deadline=None)
    def test_prop_applier_matches_trainer_everywhere(corpus, k):
        merges = train_merges_from_counts(corpus, k)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in corpus:
            sym = _word_symbols(w)
            for a, b in merges:
                sym = _merge_in_word(sym, (a, b), a + b)
            assert segment_word(w, ranks) == sym

    @given(_corpus, st.integers(min_value=1, max_value=25), _word)
    @settings(max_examples=60, deadline=None)
    def test_prop_roundtrip_on_unseen_words(corpus, k, unseen):
        ranks = {p: i for i, p in
                 enumerate(train_merges_from_counts(corpus, k))}
        sym = segment_word(unseen, ranks)
        assert "".join(sym) == unseen + WORD_END

    @given(_corpus, st.integers(min_value=0, max_value=25))
    @settings(max_examples=30, deadline=None)
    def test_prop_training_is_deterministic(corpus, k):
        # dict iteration order must not leak into the merge list:
        # rebuild the corpus in reversed insertion order
        rev = dict(reversed(list(corpus.items())))
        assert (train_merges_from_counts(corpus, k)
                == train_merges_from_counts(rev, k))
except ImportError:  # pragma: no cover - hypothesis is in the image
    pass
