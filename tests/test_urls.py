"""functions/urls.py — canonicalization spec pinned case by case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.functions.urls import canonicalize_url, surt_key

CANON_CASES = [
    # fragment stripped
    ("https://example.com/a#sec", "https://example.com/a"),
    # scheme+host lowercased, path case preserved
    ("HTTPS://Example.COM/A/B", "https://example.com/A/B"),
    # www label stripped
    ("https://www.example.com/a", "https://example.com/a"),
    # default ports stripped, non-default kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),  # 80 is not https default
    # duplicate slashes collapsed, trailing slash dropped
    ("https://example.com/a//b///c/", "https://example.com/a/b/c"),
    # bare root normalizes to no path
    ("https://example.com/", "https://example.com"),
    ("https://example.com", "https://example.com"),
    # tracking params dropped, survivors byte-sorted, empty query dropped
    ("https://example.com/a?utm_source=x&b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?gclid=99", "https://example.com/a"),
    ("https://example.com/a?fbclid=1&msclkid=2&ref=h&utm_campaign=c", "https://example.com/a"),
    ("https://example.com/a?z=1&id=10", "https://example.com/a?id=10&z=1"),
    # ref only matches as a whole param name (refid= survives)
    ("https://example.com/a?refid=7", "https://example.com/a?refid=7"),
    # everything at once
    (
        " HTTP://WWW.Example.com:80//a/b/?utm_medium=m&q=1#top ",
        "http://example.com/a/b?q=1",
    ),
]


@pytest.mark.parametrize("raw,expected", CANON_CASES)
def test_canonicalize_url(spark, raw, expected):
    row = spark.createDataFrame([(raw,)], ["u"]).select(
        canonicalize_url(F.col("u")).alias("c")
    ).first()
    assert row.c == expected


SURT_CASES = [
    ("https://maps.example.com/a?q=1", "com,example,maps)/a?q=1"),
    ("http://WWW.example.com/", "com,example)/"),
    ("https://example.com", "com,example)/"),
    ("https://m.blog.example.com/p/1#x", "com,example,blog,m)/p/1"),
    # non-default port stays in the key (distinct origin)
    ("http://example.com:8080/a", "com,example:8080)/a"),
]


@pytest.mark.parametrize("raw,expected", SURT_CASES)
def test_surt_key(spark, raw, expected):
    row = spark.createDataFrame([(raw,)], ["u"]).select(
        surt_key(F.col("u")).alias("s")
    ).first()
    assert row.s == expected


def test_surt_sorts_domain_pages_adjacently(spark):
    urls = [
        "https://a.example.com/1",
        "https://other.org/x",
        "https://b.example.com/2",
        "https://www.example.com/3",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["u"]).select(
        surt_key(F.col("u")).alias("s")
    )
    got = [r.s for r in df.orderBy("s").collect()]
    # all example.com subdomains cluster before other.org
    assert got == [
        "com,example)/3",
        "com,example,a)/1",
        "com,example,b)/2",
        "org,other)/x",
    ]


def test_canonicalize_is_jvm_only(spark):
    """No python UDF in the plan — the whole tree is codegen-able."""
    df = spark.createDataFrame([("https://www.example.com/a?utm_source=1&b=2#f",)], ["u"])
    plan = df.select(canonicalize_url(F.col("u")).alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_canonical_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) for every case."""
    df = spark.createDataFrame([(r,) for r, _ in CANON_CASES], ["u"])
    out = df.select(
        canonicalize_url(F.col("u")).alias("c1"),
    ).select(F.col("c1"), canonicalize_url(F.col("c1")).alias("c2"))
    assert out.filter(F.col("c1") != F.col("c2")).count() == 0
