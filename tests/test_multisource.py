"""Multi-source tail merge: fixed source precedence at equal ts.

Reference analog under test: the fixed-precedence multi-source merge
of language names (priority-9 English beats heart-language beats
alternates), /root/reference/load/UpdateDBPLanguageTranslation.py:47-118.
"""

import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.cdc.multisource import merge_tails


def _tail(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, ts long, html binary, op string"
    )
    return df.select(
        "url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "op"
    )


def test_latest_ts_wins_across_sources(spark):
    primary = _tail(spark, [("u1", 100, b"old-primary", "update")])
    replica = _tail(spark, [("u1", 200, b"new-replica", "update")])
    out = merge_tails([(primary, 0), (replica, 1)], keep_src=True).collect()
    assert len(out) == 1
    assert bytes(out[0]["html"]) == b"new-replica"
    assert out[0]["_src_pri"] == 1  # recency beats authority


def test_equal_ts_primary_beats_replica(spark):
    primary = _tail(spark, [("u1", 100, b"primary", "update")])
    replica = _tail(spark, [("u1", 100, b"replica", "update")])
    out = merge_tails([(primary, 0), (replica, 1)], keep_src=True).collect()
    assert bytes(out[0]["html"]) == b"primary"
    assert out[0]["_src_pri"] == 0


def test_equal_ts_authoritative_write_beats_replica_tombstone(spark):
    # priority sits ABOVE delete-beats-write: the DR replica's
    # tombstone must not erase what the primary asserts at the same ts
    primary = _tail(spark, [("u1", 100, b"live", "update")])
    replica = _tail(spark, [("u1", 100, b"", "delete")])
    out = merge_tails([(primary, 0), (replica, 1)]).collect()
    assert out[0]["op"] == "update"
    assert bytes(out[0]["html"]) == b"live"
    # ...but WITHIN one source, delete still beats write at equal ts
    one = _tail(
        spark, [("u2", 50, b"w", "update"), ("u2", 50, b"", "delete")]
    )
    out2 = merge_tails([(one, 0)]).collect()
    assert out2[0]["op"] == "delete"


def test_priority_is_rank_not_listing_order(spark):
    a = _tail(spark, [("u1", 100, b"a", "update")])
    b = _tail(spark, [("u1", 100, b"b", "update")])
    # listed second, but priority 0 -> b wins
    out = merge_tails([(a, 5), (b, 0)]).collect()
    assert bytes(out[0]["html"]) == b"b"


def test_salted_equals_unsalted(spark):
    rows = [
        (f"u{i % 7}", 100 + (i % 3), f"p{i}".encode(), "update")
        for i in range(60)
    ]
    primary = _tail(spark, rows[::2])
    replica = _tail(spark, rows[1::2])
    plain = merge_tails([(primary, 0), (replica, 1)], keep_src=True)
    salted = merge_tails(
        [(primary, 0), (replica, 1)], salt_buckets=8, keep_src=True
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_schema_mismatch_raises(spark):
    a = _tail(spark, [("u1", 100, b"a", "update")])
    b = a.withColumnRenamed("html", "body")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_tails([(a, 0), (b, 1)])
    with pytest.raises(ValueError, match="at least one"):
        merge_tails([])


def test_single_shuffle_plan(spark):
    # the union is a zero-shuffle concatenation: the only Exchange in
    # the unsalted merge plan is the per-key dedup window itself
    a = _tail(spark, [("u1", 100, b"a", "update")])
    b = _tail(spark, [("u1", 100, b"b", "update")])
    plan = merge_tails([(a, 0), (b, 1)])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
