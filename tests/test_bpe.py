"""BPE merge learning (operators/bpe.py): greedy fold semantics,
re-pairing, determinism across partitionings, checkpointed long runs,
and encode/trainer agreement."""

from pyspark.sql import functions as F

from dbp_etl_spark.operators.bpe import (
    bpe_encode,
    learn_bpe_merges,
    merge_pair_fold,
    word_freq_table,
)


def _enc(spark, word, merges):
    return spark.range(1).select(bpe_encode(F.lit(word), merges)).first()[0]


def test_greedy_fold_nonoverlapping(spark):
    out = spark.range(1).select(
        merge_pair_fold(F.split(F.lit("ppppp"), ""), "p", "p").alias("s")
    ).first()["s"]
    assert out == ["pp", "pp", "p"]


def test_repairing_merge_chain(spark):
    docs = spark.createDataFrame([("xyz xyz xyz",)], "text string")
    m = learn_bpe_merges(word_freq_table(docs), 2)
    assert [(l, r) for l, r, _ in m] == [("x", "y"), ("xy", "z")]
    assert _enc(spark, "xyz", m) == ["xyz"]


def test_counts_weighted_by_word_freq(spark):
    # 'ab' appears in two word types with freqs 3 and 2 -> count 5
    w = spark.createDataFrame(
        [("abc", 3), ("dab", 2), ("zz", 4)], "word string, freq long"
    )
    m = learn_bpe_merges(w, 1)
    assert m == [("a", "b", 5)]


def test_tiebreak_is_lexicographic(spark):
    w = spark.createDataFrame([("dc", 2), ("ba", 2)], "word string, freq long")
    (only,) = learn_bpe_merges(w, 1)
    assert only == ("b", "a", 2)


def test_partitioning_invariance_and_checkpoint(spark):
    docs = spark.createDataFrame(
        [("the cat sat on the mat",), ("the bat and the cat",)], "text string"
    )
    w = word_freq_table(docs)
    a = learn_bpe_merges(w.repartition(1), 5, checkpoint_every=2)
    b = learn_bpe_merges(w.repartition(7, "word"), 5, checkpoint_every=0)
    assert a == b and len(a) == 5


def test_stops_when_no_pairs_left(spark):
    w = spark.createDataFrame([("ab", 1)], "word string, freq long")
    m = learn_bpe_merges(w, 10)
    assert m == [("a", "b", 1)]


def test_encode_applies_merges_in_order(spark):
    merges = [("a", "b", 9), ("ab", "c", 5)]
    assert _enc(spark, "abcabx", merges) == ["abc", "ab", "x"]
    assert _enc(spark, "zzz", merges) == ["z", "z", "z"]
