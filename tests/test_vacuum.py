"""Tombstone vacuum: GC past the late-event watermark, idempotent."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.cdc import merge_batch
from dbp_etl_spark.lake import LakeTable, TableSchema

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def ev(spark, rows):
    return spark.createDataFrame(rows, "url string, ts long, html binary, op string").select(
        "url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "op"
    )


def test_vacuum_drops_expired_tombstones_only(spark, tmp_path):
    import datetime

    t = LakeTable.create(
        spark, str(tmp_path / "v"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    merge_batch(t, ev(spark, [("u1", 100, b"<p>a</p>", "insert"), ("u2", 100, b"<p>b</p>", "insert")]), "b1")
    merge_batch(t, ev(spark, [("u1", 200, None, "delete"), ("u2", 900, None, "delete")]), "b2")
    full = t.read(include_deleted=True)
    assert full.filter("_deleted").count() == 2

    watermark = datetime.datetime(1970, 1, 1, 0, 8, 20)  # epoch 500s
    t.vacuum_tombstones(watermark, batch_id="vac1")
    full2 = t.read(include_deleted=True)
    # u1's tombstone (ts=200 < 500) gone; u2's (ts=900) retained
    assert full2.filter("_deleted").count() == 1
    assert full2.filter(F.col("url") == "u2").count() == 1
    assert t.read().count() == 0  # user view unchanged

    # idempotent by ledger
    snap = t.snapshot_id
    t.vacuum_tombstones(watermark, batch_id="vac1")
    assert t.snapshot_id == snap

    # a later vacuum with a higher watermark removes the rest
    t.vacuum_tombstones(datetime.datetime(1970, 1, 1, 1, 0, 0), batch_id="vac2")
    assert t.read(include_deleted=True).filter("_deleted").count() == 0

    # late event older than the vacuumed tombstone now applies as insert
    # (documented contract: vacuum only past the late-event watermark,
    # i.e. once such events can no longer arrive)
    merge_batch(t, ev(spark, [("u1", 150, b"<p>zombie</p>", "insert")]), "b3")
    assert t.read().filter(F.col("url") == "u1").count() == 1
