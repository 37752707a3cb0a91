"""Salted dedup == unsalted dedup; latest-wins semantics.

Reference rule under test: /root/reference/load/FilenameReducer.py:73-120
(group by key, max timestamp wins, deterministic tiebreak).
"""

from pyspark.sql import functions as F

from dbp_etl_spark.cdc.dedup import cdc_order, dedup_latest
from dbp_etl_spark.cdc.generator import generate_changes


def test_latest_wins(spark):
    rows = [
        ("u1", 100, b"a", "insert"),
        ("u1", 300, b"c", "update"),
        ("u1", 200, b"b", "update"),
        ("u2", 50, b"x", "insert"),
    ]
    df = spark.createDataFrame(rows, "url string, ts long, html binary, op string").select(
        "url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "op"
    )
    out = dedup_latest(df, "url", cdc_order()).collect()
    got = {r["url"]: bytes(r["html"]) for r in out}
    assert got == {"u1": b"c", "u2": b"x"}


def test_tiebreak_deterministic(spark):
    # same url, same ts: delete outranks update outranks insert
    rows = [
        ("u1", 100, b"a", "insert"),
        ("u1", 100, b"b", "update"),
        ("u1", 100, None, "delete"),
    ]
    df = spark.createDataFrame(rows, "url string, ts long, html binary, op string").select(
        "url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "op"
    )
    out = dedup_latest(df, "url", cdc_order()).collect()
    assert len(out) == 1 and out[0]["op"] == "delete"


def test_salted_equals_unsalted(spark):
    events = generate_changes(
        spark, n_events=5000, n_urls=200, n_batches=1, hot_fraction_pct=50, hot_urls=2
    )
    plain = dedup_latest(events, "url", cdc_order(), salt_buckets=0)
    salted = dedup_latest(events, "url", cdc_order(), salt_buckets=8)
    cols = ["url", "warc_ts", "op"]
    a = sorted((r["url"], r["warc_ts"], r["op"]) for r in plain.select(cols).collect())
    b = sorted((r["url"], r["warc_ts"], r["op"]) for r in salted.select(cols).collect())
    assert a == b
    # exactly one row per url
    assert salted.groupBy("url").count().filter(F.col("count") > 1).count() == 0


def test_generator_deterministic_and_skewed(spark):
    e1 = generate_changes(spark, 2000, 100, seed=7, partitions=4, hot_fraction_pct=60, hot_urls=2)
    e2 = generate_changes(spark, 2000, 100, seed=7, partitions=13, hot_fraction_pct=60, hot_urls=2)
    h1 = e1.agg(F.sum(F.xxhash64("url", "warc_ts", "op").cast("decimal(38,0)"))).collect()[0][0]
    h2 = e2.agg(F.sum(F.xxhash64("url", "warc_ts", "op").cast("decimal(38,0)"))).collect()[0][0]
    assert h1 == h2
    # skew exists: top url has far more events than the median
    counts = e1.groupBy("url").count().orderBy(F.desc("count")).collect()
    assert counts[0]["count"] > 10 * counts[len(counts) // 2]["count"]


def test_tiebreak_null_position_sensitive(spark):
    """Rows differing ONLY in which extra columns are NULL must still
    have a deterministic total-order winner: xxhash64 skips null
    inputs, so a naive full-row hash gives (NULL,'x') and ('x',NULL)
    identical hashes — salted vs unsalted could then diverge."""
    rows = [
        ("u1", 100, b"a", "update", None, "x"),
        ("u1", 100, b"a", "update", "x", None),
    ]
    df = spark.createDataFrame(
        rows, "url string, ts long, html binary, op string, c1 string, c2 string"
    ).select(
        "url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "op", "c1", "c2"
    )
    winners = set()
    for salt in (0, 2, 4, 16):
        out = dedup_latest(df, "url", cdc_order(), salt_buckets=salt).collect()
        assert len(out) == 1
        winners.add((out[0]["c1"], out[0]["c2"]))
    # one and the same winner at every parallelism/salting level
    assert len(winners) == 1


def test_stage_by_batch_preserves_string_batch_ids(spark, tmp_path):
    """Hive partition-type inference must not coerce numeric-looking
    STRING batch ids ('0001', '07') to ints on the staged re-read —
    that would change ledger keys between staged and unstaged runs."""
    from dbp_etl_spark.cdc.runner import CDCRunner

    rows = [("u1", 100, b"a", "insert", "0001"), ("u2", 200, b"b", "insert", "07")]
    df = spark.createDataFrame(
        rows, "url string, ts long, html binary, op string, batch_id string"
    ).select(
        "url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "op", "batch_id"
    )
    staged = CDCRunner.stage_by_batch(df, str(tmp_path / "log"))
    assert staged.schema["batch_id"].dataType.simpleString() == "string"
    assert sorted(r["batch_id"] for r in staged.select("batch_id").collect()) == [
        "0001",
        "07",
    ]
    assert staged.columns == df.columns
