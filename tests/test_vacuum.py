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


def test_compact_sort_by_clusters_row_groups(spark, tmp_path):
    """compact(sort_by=['warc_ts']) physically clusters rows so parquet
    min/max stats become selective: within each rewritten file the
    timestamps are sorted (verified via pyarrow row-group statistics),
    and content is unchanged."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from dbp_etl_spark.lake import LakeTable, TableSchema
    from tests.test_lake import PAGES

    t = LakeTable.create(
        spark, str(tmp_path / "pages"), TableSchema.from_struct(PAGES), num_buckets=2
    )
    # shuffled timestamps so the initial layout is unclustered
    rows = spark.range(400).select(
        F.concat(F.lit("https://h.example/p"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.col("id") * 37, F.lit(4000))).alias(
            "warc_ts"
        ),
        F.encode(F.col("id").cast("string"), "utf-8").alias("html"),
        F.col("id").cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
    t = t.append(rows, batch_id="a")
    pre = t.state_hash()
    t = t.compact(batch_id="cluster", sort_by=["warc_ts"])
    assert t.state_hash() == pre
    # every rewritten parquet file is internally sorted by warc_ts
    checked = 0
    for f in t.manifest["files"]:
        pf = pq.ParquetFile(os.path.join(t.root, f["path"]))
        idx = [
            i
            for i in range(pf.metadata.row_group(0).num_columns)
            if pf.metadata.row_group(0).column(i).path_in_schema == "warc_ts"
        ][0]
        prev_max = None
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            # Spark may write INT96 timestamps (no stats); when stats
            # exist they must reflect the clustering
            if st is not None and st.has_min_max:
                if prev_max is not None:
                    assert st.min >= prev_max  # row groups in sorted order
                prev_max = st.max
        col = pf.read(columns=["warc_ts"]).column(0).to_pylist()
        assert col == sorted(col)
        checked += 1
    assert checked >= 2
