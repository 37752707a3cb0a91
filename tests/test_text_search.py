"""Inverted-index text search: postings build, AND search, positional
phrase search (incl. repeated tokens), and the pushed-down plan."""

import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.operators.text_search import (
    build_postings,
    posting_lists,
    search_and,
    search_phrase,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick quick slow"),
    (2, "brown dog and brown fox"),
    (3, "nothing relevant here"),
    (4, "the the the"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_shape(spark, docs):
    p = build_postings(docs)
    row = p.filter((F.col("token") == "quick") & (F.col("doc") == 1)).collect()[0]
    assert row["positions"] == [0, 1] and row["tf"] == 2
    lists = {r["token"]: r for r in posting_lists(p).collect()}
    assert lists["brown"]["df"] == 2
    assert [x["doc"] for x in lists["brown"]["postings"]] == [0, 2]


def test_search_and(spark, docs):
    p = build_postings(docs)
    got = {r["doc"]: r["total_tf"] for r in search_and(p, ["brown", "fox"]).collect()}
    assert got == {0: 2, 2: 3}  # doc2: brown x2 + fox x1
    assert search_and(p, ["slow", "dog"]).count() == 0  # never co-occur


def test_search_phrase_basic(spark, docs):
    p = build_postings(docs)
    got = {r["doc"]: r["n_matches"] for r in search_phrase(p, ["brown", "fox"]).collect()}
    assert got == {0: 1, 2: 1}
    # order matters: 'fox brown' appears nowhere
    assert search_phrase(p, ["fox", "brown"]).count() == 0


def test_search_phrase_repeated_token_and_overlap(spark, docs):
    p = build_postings(docs)
    # 'the the' in doc4 ('the the the') overlaps: starts 0 and 1
    got = {r["doc"]: r["n_matches"] for r in search_phrase(p, ["the", "the"]).collect()}
    assert got == {4: 2}
    got3 = {r["doc"]: r["n_matches"] for r in search_phrase(p, ["the", "the", "the"]).collect()}
    assert got3 == {4: 1}
    # 'quick quick' in doc1
    got_q = {r["doc"]: r["n_matches"] for r in search_phrase(p, ["quick", "quick"]).collect()}
    assert got_q == {1: 1}


def test_index_scan_pushes_token_filter(spark, docs, tmp_path):
    """Persisted index + query: the term filter reaches the parquet
    scan (PushedFilters In(token,...)), and the plan has no cartesian
    product — token-keyed work only."""
    idx_path = str(tmp_path / "postings")
    build_postings(docs).repartition("token").write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    plan = search_phrase(idx, ["brown", "fox"])._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "token" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # and the pruned scan still answers correctly
    got = {r["doc"]: r["n_matches"] for r in search_phrase(idx, ["brown", "fox"]).collect()}
    assert got == {0: 1, 2: 1}
