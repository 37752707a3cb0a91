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


def _full_row_set(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(
            (v is None, repr(bytes(v)) if isinstance(v, (bytes, bytearray)) else repr(v))
            for v in (r[c] for c in cols)
        )
        for r in df.collect()
    )


def test_agg_dedup_equals_window_dedup(spark):
    """dedup_latest_cdc (groupBy+max_by) must pick the EXACT row the
    window form picks, on a generated log with hot keys, deletes,
    same-ts ties and payload ties."""
    from dbp_etl_spark.cdc.dedup import dedup_latest_cdc

    events = generate_changes(
        spark, n_events=8000, n_urls=150, n_batches=1, hot_fraction_pct=40, hot_urls=3
    ).drop("batch_id")
    win = dedup_latest(events, "url", cdc_order(), salt_buckets=8)
    agg = dedup_latest_cdc(events, "url")
    assert _full_row_set(win) == _full_row_set(agg)


def test_agg_dedup_nulls_and_ties(spark):
    """Adversarial null/tie shapes: null ts loses, null payload loses
    the md5 tiebreak, delete beats write at equal ts, full-tie rows
    resolve identically (hash tiebreak)."""
    from dbp_etl_spark.cdc.dedup import dedup_latest_cdc

    rows = [
        ("u1", 100, b"a", "update"),
        ("u1", None, b"z", "update"),     # null ts loses to any ts
        ("u2", 100, None, "update"),      # null payload...
        ("u2", 100, b"a", "update"),      # ...loses md5 tiebreak
        ("u3", 100, b"a", "update"),
        ("u3", 100, None, "delete"),      # delete beats write at equal ts
        ("u4", 100, b"a", "update"),      # exact duplicate pair:
        ("u4", 100, b"a", "update"),      # hash tiebreak, either row same bytes
        ("u5", None, None, "update"),     # all-null-order key still yields a row
    ]
    df = spark.createDataFrame(
        rows, "url string, ts long, html binary, op string"
    ).select("url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "op")
    win = dedup_latest(df, "url", cdc_order())
    agg = dedup_latest_cdc(df, "url")
    assert _full_row_set(win) == _full_row_set(agg)
    got = {r["url"]: (bytes(r["html"]) if r["html"] is not None else None, r["op"])
           for r in agg.collect()}
    assert got["u1"] == (b"a", "update")
    assert got["u2"] == (b"a", "update")
    assert got["u3"] == (None, "delete")
    assert got["u4"] == (b"a", "update")
    assert len(got) == 5


def test_agg_dedup_batch_tiebreak(spark):
    """Fused-group earliest-batch-wins: rows tying on (ts, op, payload)
    resolve to the lowest batch ordinal, matching cdc_order(batch_col)
    asc; a batch value outside batch_order loses like nulls-last."""
    from dbp_etl_spark.cdc.dedup import dedup_latest_cdc

    rows = [
        ("u1", 100, b"a", "update", "b2"),
        ("u1", 100, b"a", "update", "b1"),   # same everything: b1 wins
        ("u2", 100, b"a", "update", "b9"),   # outside the order: loses
        ("u2", 100, b"a", "update", "b2"),
    ]
    df = spark.createDataFrame(
        rows, "url string, ts long, html binary, op string, batch_id string"
    ).select("url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "op", "batch_id")
    win = dedup_latest(df, "url", cdc_order(batch_col="batch_id"))
    agg = dedup_latest_cdc(df, "url", batch_col="batch_id", batch_order=["b1", "b2"])
    got = {r["url"]: r["batch_id"] for r in agg.collect()}
    assert got == {"u1": "b1", "u2": "b2"}
    assert _full_row_set(win) == _full_row_set(agg)
