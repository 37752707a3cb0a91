"""Efraimidis–Spirakis weighted sampling (operators/sampling.py):
salt invariance, partitioning invariance, weight proportionality, and
degenerate weights."""

from pyspark.sql import functions as F

from dbp_etl_spark.operators.sampling import es_key, weighted_sample_stratified
from dbp_etl_spark.plans.checks import plan_str


def _docs(spark, n=400, strata=4):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % strata).cast("string")).alias("source"),
        (F.col("id") % 50 + 1).alias("n_chars"),
    )


def _sample_set(df):
    return {(r.source, r.rank, r.doc_id) for r in df.collect()}


def test_salted_equals_unsalted(spark):
    d = _docs(spark)
    a = weighted_sample_stratified(d, "source", "n_chars", 7, salt_buckets=1)
    b = weighted_sample_stratified(d, "source", "n_chars", 7, salt_buckets=32)
    assert _sample_set(a) == _sample_set(b)


def test_partitioning_invariance(spark):
    d = _docs(spark)
    a = weighted_sample_stratified(d.repartition(1), "source", "n_chars", 5)
    b = weighted_sample_stratified(d.repartition(13, "doc_id"), "source", "n_chars", 5)
    assert _sample_set(a) == _sample_set(b)


def test_k_per_stratum_and_rank_contiguous(spark):
    out = weighted_sample_stratified(_docs(spark), "source", "n_chars", 7).collect()
    by_stratum = {}
    for r in out:
        by_stratum.setdefault(r.source, []).append(r.rank)
    assert set(by_stratum) == {"s0", "s1", "s2", "s3"}
    for ranks in by_stratum.values():
        assert sorted(ranks) == list(range(1, 8))


def test_weight_proportionality(spark):
    # one stratum, weights 1 vs 100: across 40 seeds the heavy half
    # must dominate the sample (ES inclusion odds scale with weight)
    d = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("s").alias("source"),
        F.when(F.col("id") < 100, 1).otherwise(100).alias("w"),
    )
    heavy = light = 0
    for seed in range(40):
        for r in weighted_sample_stratified(d, "source", "w", 10, seed=seed).collect():
            if r.doc_id >= 100:
                heavy += 1
            else:
                light += 1
    assert heavy > 8 * light, (heavy, light)


def test_nonpositive_and_null_weights_excluded(spark):
    d = spark.createDataFrame(
        [(1, "s", 10), (2, "s", 0), (3, "s", -5), (4, "s", None), (5, "s", 3)],
        "doc_id int, source string, w int",
    )
    out = weighted_sample_stratified(d, "source", "w", 10).collect()
    assert {r.doc_id for r in out} == {1, 5}


def test_es_key_null_for_bad_weight(spark):
    d = spark.createDataFrame([(1, 0.0)], "doc_id int, w double")
    (r,) = d.select(es_key(F.col("doc_id"), F.col("w")).alias("k")).collect()
    assert r.k is None


def test_no_single_partition_exchange(spark):
    out = weighted_sample_stratified(_docs(spark), "source", "n_chars", 7)
    assert "SinglePartition" not in plan_str(out, "simple")


# ------------------------------------------------------------ hash split


def test_hash_split_deterministic_and_complete(spark):
    from dbp_etl_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(f"host{i}.com",) for i in range(500)], "k string")
    a = {r["k"]: r["split"] for r in hash_split(df, "k").collect()}
    b = {r["k"]: r["split"] for r in hash_split(df, "k").collect()}
    assert a == b
    assert set(a.values()) == {"train", "val", "test"}
    frac = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.7 < frac < 0.9


def test_hash_split_key_rows_stay_together(spark):
    from dbp_etl_spark.operators.sampling import hash_split

    rows = [(f"h{i % 11}", i) for i in range(200)]
    df = spark.createDataFrame(rows, "k string, v int")
    got = hash_split(df, "k").groupBy("k").agg(F.countDistinct("split").alias("n")).collect()
    assert all(r["n"] == 1 for r in got)


def test_hash_split_bad_percents_raise(spark):
    import pytest as _pytest

    from dbp_etl_spark.operators.sampling import hash_split

    df = spark.createDataFrame([("a",)], "k string")
    with _pytest.raises(ValueError):
        hash_split(df, "k", splits=[("train", 50), ("val", 20)])


def test_hash_split_map_only_plan(spark):
    from dbp_etl_spark.operators.sampling import hash_split

    df = spark.createDataFrame([("a",)], "k string")
    plan = hash_split(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
