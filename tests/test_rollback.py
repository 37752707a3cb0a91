"""rollback_to: metadata-only restore of an earlier snapshot as a new
commit — the bad-batch recovery path (DriftError → inspect → rollback
→ re-tail). Reference analog: transactional batch rollback,
/root/reference/load/SQLBatchExec.py:58-99."""

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


def mk_rows(spark, n, tag="v1", base=0):
    return spark.range(base, base + n).select(
        F.concat(F.lit("https://h.example/p"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<p>"), F.col("id"), F.lit(tag), F.lit("</p>")), "utf-8").alias(
            "html"
        ),
        F.concat(F.col("id").cast("string"), F.lit(tag)).alias("text"),
        F.lit("en").alias("lang"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )


def test_rollback_restores_state_history_moves_forward(spark, table):
    t = table.append(mk_rows(spark, 10), batch_id="b1")
    s1 = t.snapshot_id
    t = t.append(mk_rows(spark, 5, base=100), batch_id="b2")
    good_hash = None
    t = t.rollback_to(s1)
    assert t.snapshot_id == s1 + 2  # forward commit, not a pointer rewind
    assert t.read().count() == 10
    assert t.manifest["summary"] == {"rollback_to": s1}
    # time travel still sees the rolled-back snapshot
    assert t.read(snapshot_id=s1 + 1).count() == 15
    del good_hash


def test_undone_batch_reapplies_and_converges(spark, table):
    """The ledger reverts with the state: b2 is no longer committed
    after rolling it back, so a log replay re-applies it and the final
    state is byte-identical to the original head."""
    t = table.append(mk_rows(spark, 10), batch_id="b1")
    s1 = t.snapshot_id
    t = t.append(mk_rows(spark, 5, base=100), batch_id="b2")
    original = t.state_hash()
    t = t.rollback_to(s1)
    assert not t.is_committed("b2")
    assert t.is_committed("b1")
    t = t.append(mk_rows(spark, 5, base=100), batch_id="b2")  # replayed from the log
    assert t.state_hash() == original


def test_rollback_idempotent_and_guards(spark, table):
    t = table.append(mk_rows(spark, 4), batch_id="b1")
    s1 = t.snapshot_id
    t = t.append(mk_rows(spark, 4, base=50), batch_id="b2")
    t = t.rollback_to(s1, batch_id="rb-1")
    snap = t.snapshot_id
    t = t.rollback_to(s1, batch_id="rb-1")  # replayed id: no-op
    assert t.snapshot_id == snap
    # a LATER rollback to the same target is a fresh commit (the
    # default id is scoped to the head it rolled back from)
    t = t.append(mk_rows(spark, 1, base=99), batch_id="b3")
    t = t.rollback_to(s1)
    assert t.snapshot_id == snap + 2
    assert t.read().count() == 4
    with pytest.raises(ValueError, match="roll forward"):
        t.rollback_to(snap + 10)
    # rollback to the current head is a no-op
    assert t.rollback_to(t.snapshot_id).snapshot_id == snap + 2


def test_rollback_past_retention_refused_and_files_survive(spark, table):
    t = table.append(mk_rows(spark, 6), batch_id="b1")
    s1 = t.snapshot_id
    t = t.append(mk_rows(spark, 2, base=60), batch_id="b2")
    t = t.append(mk_rows(spark, 2, base=70), batch_id="b3")
    t = t.rollback_to(s1)
    # expiring history AFTER the rollback keeps the re-referenced files
    t.expire_snapshots(keep_last=1)
    t = t.refresh()
    assert t.read().count() == 6
    with pytest.raises(SnapshotExpired):
        t.rollback_to(s1)  # target itself now expired... but
    # (the live state still IS s1's content — only time travel expired)
    assert t.read().count() == 6


def test_rollback_reverts_schema(spark, table):
    t = table.append(mk_rows(spark, 3), batch_id="b1")
    s1 = t.snapshot_id
    t = t.add_column("rating", "double")
    t = t.update_where(F.col("url").isNotNull(), {"rating": F.lit(5.0)}, batch_id="b2")
    assert "rating" in t.read().columns
    t = t.rollback_to(s1)
    assert "rating" not in t.read().columns
    assert t.read().count() == 3
    # the later schema version stays registered; re-adding works fresh
    t = t.add_column("rating", "double")
    assert "rating" in t.read().columns


def test_rollback_across_rebucket_restores_layout(spark, table):
    """Rolling back across a rebucket must restore num_buckets with the
    files: old-layout files under the new bucket function would break
    pruned reads and make merges treat live keys as absent (review r4
    finding #2)."""
    from dbp_etl_spark.cdc import CDCRunner

    t = table
    CDCRunner(t, salt_buckets=4).run(
        mk_rows(spark, 40)
        .withColumn("op", F.lit("insert"))
        .withColumn("batch_id", F.lit(0).cast("long"))
    )
    t = t.refresh()
    s1 = t.snapshot_id
    t = t.rebucket(16, batch_id="grow")
    t = t.rollback_to(s1)
    assert t.num_buckets == 4
    # a keyed merge after the rollback still finds its target (no
    # duplicate insert) and updates in place
    up = spark.createDataFrame(
        [("https://h.example/p1", 1900000000, b"<p>upd</p>", "update")],
        "url string, ts long, html binary, op string",
    ).select(
        "url",
        F.timestamp_seconds("ts").alias("warc_ts"),
        "html",
        "op",
        F.lit(9).cast("long").alias("batch_id"),
    )
    CDCRunner(t, salt_buckets=4).run(up)
    t = t.refresh()
    rows = t.read().filter(F.col("url") == "https://h.example/p1").collect()
    assert len(rows) == 1
    assert bytes(rows[0]["html"]) == b"<p>upd</p>"
    assert t.read().count() == 40
