"""Repetition scoring + PII redaction (functions/quality.py)."""

from pyspark.sql import functions as F

from dbp_etl_spark.functions.quality import pii_counts, redact_pii, repetition_exprs


def _one(spark, text):
    return spark.createDataFrame([(text,)], "txt string")


def test_redact_pii_all_patterns(spark):
    txt = (
        "write to Jo.Smith+spam@sub.example.co.uk or admin@x.io, "
        "server 192.168.0.1 backup 10.2.3.4, call 555-123-4567 now"
    )
    row = (
        _one(spark, txt)
        .select(redact_pii("txt").alias("red"), pii_counts("txt").alias("c"))
        .collect()[0]
    )
    assert row["red"] == (
        "write to <EMAIL> or <EMAIL>, server <IP> backup <IP>, call <PHONE> now"
    )
    assert (row["c"]["n_email"], row["c"]["n_ipv4"], row["c"]["n_phone"]) == (2, 2, 1)


def test_redact_pii_no_false_positives(spark):
    txt = "version 1.2 of spec 3.4 shipped 555-12 and a-b@ nothing"
    row = _one(spark, txt).select(redact_pii("txt").alias("red")).collect()[0]
    assert row["red"] == txt


def test_repetition_exprs_values(spark):
    # 'a b a b a' -> bigrams [a b, b a, a b, b a]: 2 distinct of 4 ->
    # dup 0.5; top token 'a' 3/5 = 0.6
    df = _one(spark, "a b a b a").select(
        *[v.alias(k) for k, v in repetition_exprs(F.split("txt", " ")).items()]
    )
    row = df.collect()[0]
    assert row["dup_bigram_frac"] == 0.5
    assert row["top_token_frac"] == 0.6
    # all-distinct text: zero duplication, uniform tokens
    row2 = (
        _one(spark, "w x y z")
        .select(*[v.alias(k) for k, v in repetition_exprs(F.split("txt", " ")).items()])
        .collect()[0]
    )
    assert row2["dup_bigram_frac"] == 0.0
    assert row2["top_token_frac"] == 0.25


def test_quality_plans_are_map_only(spark, tmp_path):
    """Both operators must compile to a single project over the scan:
    no exchange, no Python eval."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), (F.col("id") % 7).cast("string"), F.lit(" x y z")).alias(
            "text"
        ),
    )
    ex = repetition_exprs(F.split("text", " "))
    plan = (
        df.select("doc_id", *[v.alias(k) for k, v in ex.items()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    red = df.select(redact_pii("text").alias("r"), pii_counts("text").alias("c"))
    plan2 = red._jdf.queryExecution().executedPlan().toString()
    for p in (plan, plan2):
        assert "Exchange" not in p
        assert "Python" not in p and "ArrowEval" not in p


def test_bigram_lm_nll_hand_computed(spark):
    import math

    from dbp_etl_spark.functions.quality import bigram_lm_nll

    import pytest

    docs = spark.createDataFrame([(0, "a b a"), (1, "a")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in bigram_lm_nll(docs).collect()}
    # corpus: c1(a)=3, c1(b)=1, V=2; c2(a,b)=1, c2(b,a)=1
    p_b_a = (1 + 0.5) / (3 + 0.5 * 2)
    p_a_b = (1 + 0.5) / (1 + 0.5 * 2)
    want = -(math.log(p_b_a) + math.log(p_a_b)) / 2
    assert rows[0]["n_bigrams"] == 2
    assert rows[0]["nll"] == pytest.approx(round(want, 4), abs=1e-9)
    # <2 tokens: no bigrams, NULL score (never a crash — r4 advice class)
    assert rows[1]["n_bigrams"] == 0 and rows[1]["nll"] is None


def test_bigram_lm_nll_ranks_gibberish_above_fluent(spark):
    from dbp_etl_spark.functions.quality import bigram_lm_nll

    fluent = "the cat sat on the mat " * 10
    docs = spark.createDataFrame(
        [(0, fluent.strip()), (1, fluent.strip()), (2, "mat the on sat zq cat qz xx")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["nll"] for r in bigram_lm_nll(docs).collect()}
    assert rows[2] > rows[0]  # shuffled/rare-token doc scores worse


def test_dsir_scores_target_docs_higher(spark):
    """Docs drawn from the target vocabulary must outscore docs drawn
    from a disjoint raw-only vocabulary (the selection invariant)."""
    from pyspark.sql import functions as F

    from dbp_etl_spark.functions.quality import (
        dsir_log_ratio_table,
        dsir_score_expr,
    )

    rows = [(i, "alpha beta gamma delta alpha beta", "wiki") for i in range(5)]
    rows += [(i + 5, "zork quux blarg snark zork quux", "crawl") for i in range(5)]
    rows += [(10, "alpha beta zork quux", "crawl")]  # mixed doc
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    lr = dsir_log_ratio_table(docs, F.col("source") == "wiki", n_buckets=32, seed=7)
    assert len(lr) == 32
    got = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", dsir_score_expr(lr, seed=7).alias("s")
        ).collect()
    }
    target_like = min(got[i] for i in range(5))
    raw_only = max(got[i + 5] for i in range(5))
    assert target_like > raw_only
    assert raw_only < got[10] < target_like  # mixed doc lands between
