"""Block-level boilerplate removal (functions/boilerplate.py):
classifier signals, the both-neighbors context rule, degenerate pages,
and the map-only plan invariant."""

from pyspark.sql import functions as F

from dbp_etl_spark.functions.boilerplate import boilerplate_exprs
from dbp_etl_spark.plans.checks import plan_str

NAV = '<div><a href="/">Home page link</a> <a href="/about">About our site</a></div>'
GOOD1 = "<p>the value of the data in table 42 is one of the best and the scan is fast</p>"
GOOD1_TXT = "the value of the data in table 42 is one of the best and the scan is fast"
GOOD2 = "<p>all of the rows in this table are sorted by the key and the scan is fast</p>"
GOOD2_TXT = "all of the rows in this table are sorted by the key and the scan is fast"
SHORT = "<p>Read more details below</p>"
SHORT_TXT = "Read more details below"
FOOTER = "<p>(c) 2026 Example Corp</p>"
JUNK = "<div>x7f z0q l9w r8e t7y u6i o5p a4s v3c</div>"


def _run(spark, pages):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(pages)], "id int, html string"
    )
    ex = boilerplate_exprs(F.col("html"))
    rows = (
        df.select("id", *[v.alias(k) for k, v in ex.items()])
        .orderBy("id")
        .collect()
    )
    return rows


def test_full_page_keeps_content_and_rescued_short(spark):
    (r,) = _run(spark, [NAV + GOOD1 + SHORT + GOOD2 + FOOTER + JUNK])
    assert r.n_blocks == 6
    assert r.n_good == 3
    assert r.content == f"{GOOD1_TXT}\n{SHORT_TXT}\n{GOOD2_TXT}"


def test_short_needs_both_neighbors_good(spark):
    # short between good and junk -> dropped; footer after good -> dropped
    (r,) = _run(spark, [GOOD1 + SHORT + JUNK + FOOTER])
    assert r.n_good == 1
    assert r.content == GOOD1_TXT


def test_lone_short_and_edges_drop(spark):
    lone, first, last = _run(
        spark, [SHORT, SHORT + GOOD1, GOOD1 + SHORT]
    )
    assert lone.n_good == 0 and lone.content == ""
    # edge shorts have a missing neighbor -> never promoted
    assert first.content == GOOD1_TXT
    assert last.content == GOOD1_TXT


def test_link_density_kills_stopword_rich_nav(spark):
    # anchor text that is itself stopword-dense still classifies bad
    nav = '<div><a href="/">the best of all the data</a></div>'
    (r,) = _run(spark, [nav])
    assert r.n_good == 0


def test_degenerate_pages(spark):
    empty, tagonly = _run(spark, ["", "<p></p><div></div>"])
    assert (empty.n_blocks, empty.n_good, empty.content) == (0, 0, "")
    assert (tagonly.n_blocks, tagonly.n_good, tagonly.content) == (0, 0, "")


def test_null_html_propagates_null(spark):
    df = spark.createDataFrame([(1, None)], "id int, html string")
    ex = boilerplate_exprs(F.col("html"))
    (r,) = df.select(*[v.alias(k) for k, v in ex.items()]).collect()
    assert r.n_blocks is None and r.n_good is None and r.content is None


def test_plan_is_map_only_pure_jvm(spark):
    df = spark.range(8).select(
        F.concat(F.lit(NAV + GOOD1), F.col("id").cast("string")).alias("html")
    )
    ex = boilerplate_exprs(F.col("html"))
    out = df.select(*[v.alias(k) for k, v in ex.items()])
    plan = plan_str(out, "simple")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # no Arrow/Batch python nodes
