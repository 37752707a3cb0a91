"""HTML head-metadata extraction: entity decode, attribute-order
tolerance, NULL-for-absent, and the no-UDF plan guarantee."""

from pyspark.sql import functions as F

from dbp_etl_spark.functions.extract import decode_entities, html_meta_exprs


def _meta(spark, html: bytes):
    df = spark.createDataFrame([(html,)], "html binary")
    exprs = html_meta_exprs(F.col("html"))
    return df.select(*[c.alias(n) for n, c in exprs.items()]).collect()[0]


def test_full_head(spark):
    r = _meta(
        spark,
        b'<HTML Lang="EN-us"><head><TITLE>A &amp; B\n\t C</TITLE>'
        b'<link href="https://x.example/a" rel="canonical">'
        b'<meta content="Hello &quot;w&quot;" name="description">'
        b'<meta name="ROBOTS" content="NOINDEX, noFollow"></head></HTML>',
    )
    assert r["title"] == "A & B C"
    assert r["canonical_url"] == "https://x.example/a"
    assert r["meta_description"] == 'Hello "w"'
    assert r["robots_meta"] == "noindex, nofollow"
    assert r["html_lang"] == "en-us"


def test_absent_fields_are_null(spark):
    r = _meta(spark, b"<html><body>no head</body></html>")
    assert r["title"] is None
    assert r["canonical_url"] is None
    assert r["meta_description"] is None
    assert r["robots_meta"] is None
    assert r["html_lang"] is None
    # empty/whitespace-only title is NULL, not ''
    r2 = _meta(spark, b"<html><head><title>  \n </title></head></html>")
    assert r2["title"] is None


def test_double_escaped_amp_single_decode(spark):
    # &amp;lt; must become the literal text "&lt;", never "<"
    df = spark.createDataFrame([("x &amp;lt; y",)], "s string")
    out = df.select(decode_entities(F.col("s")).alias("d")).collect()[0]["d"]
    assert out == "x &lt; y"


def test_first_match_wins_and_case_insensitive(spark):
    r = _meta(
        spark,
        b'<html><head><title>first</title><title>second</title>'
        b'<LINK REL="canonical" HREF="https://x.example/1">'
        b'<link rel="canonical" href="https://x.example/2"></head></html>',
    )
    assert r["title"] == "first"
    assert r["canonical_url"] == "https://x.example/1"


def test_plan_has_no_python_udf(spark):
    df = spark.createDataFrame([(b"<title>t</title>",)], "html binary")
    exprs = html_meta_exprs(F.col("html"))
    plan = (
        df.select(*[c.alias(n) for n, c in exprs.items()])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
