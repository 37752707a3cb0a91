"""Snapshot tags: named time travel + retention pinning."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.lake import LakeTable, TableSchema
from dbp_etl_spark.lake.table import SnapshotExpired

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def mk_rows(spark, n, base=0):
    return spark.range(base, base + n).select(
        F.concat(F.lit("https://h.example/p"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<p>"), F.col("id"), F.lit("</p>")), "utf-8").alias("html"),
        F.col("id").cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )


def test_tag_read_and_resolve(spark, table):
    t = table.append(mk_rows(spark, 10), batch_id="b1")
    t = t.tag_snapshot("audit-cut")  # tags the head
    cut = t.resolve_tag("audit-cut")
    t = t.append(mk_rows(spark, 5, base=100), batch_id="b2")
    assert t.read().count() == 15
    assert t.read(tag="audit-cut").count() == 10
    assert t.tags == {"audit-cut": cut}
    with pytest.raises(KeyError):
        t.resolve_tag("nope")
    with pytest.raises(ValueError, match="not both"):
        t.read(tag="audit-cut", snapshot_id=1)


def test_tag_pins_retention_until_untagged(spark, table):
    t = table.append(mk_rows(spark, 6), batch_id="b1")
    t = t.tag_snapshot("keep-me")
    pinned = t.resolve_tag("keep-me")
    for i in range(4):
        t = t.append(mk_rows(spark, 1, base=50 + i), batch_id=f"b{i + 2}")
    t.expire_snapshots(keep_last=1)
    t = t.refresh()
    # the tagged snapshot (and everything above it) survived
    assert t.min_retained_snapshot == pinned
    assert t.read(tag="keep-me").count() == 6
    # dropping the tag releases the pin; expiry then advances
    t = t.untag_snapshot("keep-me")
    t.expire_snapshots(keep_last=1)
    t = t.refresh()
    assert t.min_retained_snapshot > pinned
    with pytest.raises(SnapshotExpired):
        t.read(snapshot_id=pinned)


def test_tag_immutable_and_idempotent(spark, table):
    t = table.append(mk_rows(spark, 3), batch_id="b1")
    t = t.tag_snapshot("v1")
    snap = t.snapshot_id
    t = t.tag_snapshot("v1")  # already tagged: ensure semantics, no-op
    assert t.snapshot_id == snap
    t = t.append(mk_rows(spark, 1, base=9), batch_id="b2")
    assert t.tag_snapshot("v1").snapshot_id == t.snapshot_id  # still a no-op
    with pytest.raises(ValueError, match="untag first"):
        t.tag_snapshot("v1", snapshot_id=t.snapshot_id)  # MOVING is refused
    t = t.untag_snapshot("v1")
    t = t.untag_snapshot("v1")  # double drop: no-op
    t = t.tag_snapshot("v1")  # re-create at the new head
    assert t.resolve_tag("v1") == t.snapshot_id - 1  # head before the tag commit
    assert t.read(tag="v1").count() == 4


def test_tag_expired_snapshot_refused(spark, table):
    t = table.append(mk_rows(spark, 2), batch_id="b1")
    old = t.snapshot_id
    for i in range(3):
        t = t.append(mk_rows(spark, 1, base=20 + i), batch_id=f"b{i + 2}")
    t.expire_snapshots(keep_last=1)
    t = t.refresh()
    with pytest.raises(SnapshotExpired):
        t.tag_snapshot("too-late", snapshot_id=old)
    with pytest.raises(ValueError, match="beyond head"):
        t.tag_snapshot("future", snapshot_id=t.snapshot_id + 5)


def test_retag_after_untag_actually_pins(spark, table):
    """create -> untag -> re-create at the SAME snapshot must create a
    real tag (the first create's ledger entry must not swallow the
    replay — review r4 finding #3), and the retention pin must hold."""
    t = table.append(mk_rows(spark, 4), batch_id="b1")
    target = t.snapshot_id
    t = t.tag_snapshot("audit", snapshot_id=target)
    t = t.untag_snapshot("audit")
    assert t.tags == {}
    t = t.tag_snapshot("audit", snapshot_id=target)  # re-pin
    assert t.tags == {"audit": target}
    for i in range(3):
        t = t.append(mk_rows(spark, 1, base=30 + i), batch_id=f"b{i + 2}")
    t.expire_snapshots(keep_last=1)
    t = t.refresh()
    assert t.read(tag="audit").count() == 4  # pin held


def test_create_view_time_travel(spark, table):
    t = table.append(mk_rows(spark, 5), batch_id="b1")
    t = t.tag_snapshot("cut")
    t = t.append(mk_rows(spark, 3, base=50), batch_id="b2")
    t.create_view("pages_now")
    t.create_view("pages_cut", tag="cut")
    assert spark.sql("SELECT count(*) n FROM pages_now").collect()[0]["n"] == 8
    assert spark.sql("SELECT count(*) n FROM pages_cut").collect()[0]["n"] == 5
