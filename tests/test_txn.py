"""Multi-table atomic transactions (lake/txn.py): all-or-nothing
commit across LakeTables, crash recovery from the WAL record, and
serialization with single-table writers through the coordinator lock.

Reference analog: the coordinated fileset+stream table commit,
/root/reference/load/DBPLoadController.py:126-140."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.lake import LakeTable, TableSchema, TxnAborted, TxnCoordinator
from dbp_etl_spark.lake.table import CommitConflict

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def mk_rows(spark, n, tag="v1"):
    return spark.range(n).select(
        F.concat(F.lit("https://h.example/p"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("warc_ts"),
        F.encode(F.concat(F.lit("<p>"), F.col("id"), F.lit(tag), F.lit("</p>")), "utf-8").alias(
            "html"
        ),
        F.concat(F.col("id").cast("string"), F.lit(tag)).alias("text"),
        F.lit("en").alias("lang"),
    )


@pytest.fixture()
def pair(spark, tmp_path):
    a = LakeTable.create(
        spark, str(tmp_path / "a"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    b = LakeTable.create(
        spark, str(tmp_path / "b"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    coord = TxnCoordinator(str(tmp_path / "_txn"))
    return a, b, coord


def test_atomic_two_table_commit(spark, pair):
    a, b, coord = pair
    with coord.transaction([a, b]) as txn:
        ta, tb = txn.tables
        ta.append(mk_rows(spark, 10), batch_id="fileset-1")
        tb.append(mk_rows(spark, 3, tag="s"), batch_id="stream-1")
    a2, b2 = a.refresh(), b.refresh()
    assert (a2.snapshot_id, b2.snapshot_id) == (1, 1)
    assert a2.read().count() == 10 and b2.read().count() == 3
    # the group's ledger entries landed with the commit: replay no-ops
    assert a2.is_committed("fileset-1") and b2.is_committed("stream-1")
    with coord.transaction([a2, b2]) as txn:
        ta, tb = txn.tables
        ta.append(mk_rows(spark, 10), batch_id="fileset-1")
        tb.append(mk_rows(spark, 3, tag="s"), batch_id="stream-1")
    assert (a.refresh().snapshot_id, b.refresh().snapshot_id) == (1, 1)


def test_abort_publishes_nothing(spark, pair):
    a, b, coord = pair
    with pytest.raises(TxnAborted):
        with coord.transaction([a, b]) as txn:
            ta, tb = txn.tables
            ta.append(mk_rows(spark, 5), batch_id="x1")
            raise ValueError("boom after first member staged")
    a2, b2 = a.refresh(), b.refresh()
    assert (a2.snapshot_id, b2.snapshot_id) == (0, 0)
    assert a2.read().count() == 0
    assert not a2.is_committed("x1")
    # coordinator is reusable after the abort
    with coord.transaction([a2, b2]) as txn:
        txn.tables[0].append(mk_rows(spark, 5), batch_id="x1")
    assert a.refresh().read().count() == 5


def test_crash_between_record_and_finalize_recovers(spark, pair, monkeypatch):
    """The record create is the commit point: a crash before finalize
    leaves both tables unpublished, and the next lock holder publishes
    BOTH members from the record — never one."""
    a, b, coord = pair
    monkeypatch.setattr(
        coord, "_finalize", lambda rec, name: (_ for _ in ()).throw(RuntimeError("crash"))
    )
    with pytest.raises(RuntimeError, match="crash"):
        with coord.transaction([a, b]) as txn:
            ta, tb = txn.tables
            ta.append(mk_rows(spark, 7), batch_id="w1")
            tb.append(mk_rows(spark, 2, tag="s"), batch_id="w2")
    monkeypatch.undo()
    # nothing visible yet — the manifests were never published
    assert (a.refresh().snapshot_id, b.refresh().snapshot_id) == (0, 0)
    # a fresh coordinator over the same root repairs on first use
    coord2 = TxnCoordinator(coord.root)
    assert coord2.recover() == 1
    a2, b2 = a.refresh(), b.refresh()
    assert (a2.snapshot_id, b2.snapshot_id) == (1, 1)
    assert a2.read().count() == 7 and b2.read().count() == 2
    assert coord2.recover() == 0  # idempotent: done marker retires it


def test_single_table_writer_serializes_and_recovers(spark, pair, monkeypatch):
    """A plain single-table commit through table_lock() first publishes
    any committed-but-unfinalized transaction, so it can never steal
    that transaction's snapshot id; its stale handle then conflicts and
    the refreshed retry lands on top."""
    a, b, coord = pair
    monkeypatch.setattr(
        coord, "_finalize", lambda rec, name: (_ for _ in ()).throw(RuntimeError("crash"))
    )
    with pytest.raises(RuntimeError):
        with coord.transaction([a, b]) as txn:
            txn.tables[0].append(mk_rows(spark, 4), batch_id="t1")
    monkeypatch.undo()
    writer = a.refresh()  # head still 0: txn unfinalized
    assert writer.snapshot_id == 0
    writer.lock = coord.table_lock()
    with pytest.raises(CommitConflict):
        writer.append(mk_rows(spark, 1, tag="z"), batch_id="solo")
    writer = writer.refresh()  # recovery (run under the lock) published v1
    assert writer.snapshot_id == 1
    writer.lock = coord.table_lock()
    writer.append(mk_rows(spark, 1, tag="z"), batch_id="solo")
    assert writer.snapshot_id == 2
    assert writer.refresh().read().count() == 5  # 4 from txn + 1 solo


def test_multiple_ops_same_table_in_txn(spark, pair):
    """Several staged commits on one table publish every intermediate
    manifest, so the head roll-forward walks an unbroken chain."""
    a, b, coord = pair
    with coord.transaction([a]) as txn:
        (ta,) = txn.tables
        ta.append(mk_rows(spark, 6), batch_id="m1")
        ta.delete_where(F.col("url") == "https://h.example/p0", batch_id="m2")
    a2 = a.refresh()
    assert a2.snapshot_id == 2
    assert a2.read().count() == 5
    meta = os.path.join(a2.root, "_meta")
    assert all(os.path.exists(os.path.join(meta, f"v{i}.json")) for i in (1, 2))


def test_cdc_merge_inside_txn(spark, pair):
    """A real CDC MERGE (merge_batch) stages like any other write: the
    upsert to table A and the bulk append to table B are one atomic
    group."""
    from dbp_etl_spark.cdc.merge import merge_batch

    a, b, coord = pair
    a.append(mk_rows(spark, 5), batch_id="seed")
    batch = spark.createDataFrame(
        [
            ("https://h.example/p0", 1800000000, b"<p>new</p>", "update"),
            ("https://h.example/p9", 1800000000, b"<p>ins</p>", "insert"),
        ],
        "url string, ts long, html binary, op string",
    ).select(
        "url",
        F.timestamp_seconds("ts").alias("warc_ts"),
        "html",
        "op",
        F.lit(1).cast("long").alias("batch_id"),
    )
    with coord.transaction([a, b]) as txn:
        ta, tb = txn.tables
        res = merge_batch(ta, batch, batch_id="b1", salt_buckets=4)
        assert not res.skipped
        tb.append(mk_rows(spark, 2, tag="s"), batch_id="side-1")
    a2, b2 = a.refresh(), b.refresh()
    assert a2.read().count() == 6  # 5 seed + 1 insert
    got = a2.read().filter(F.col("url") == "https://h.example/p0").collect()[0]
    assert bytes(got["html"]) == b"<p>new</p>"
    assert b2.read().count() == 2


def test_consistent_frontier_and_prune(spark, pair):
    a, b, coord = pair
    for i in range(3):
        a, b = a.refresh(), b.refresh()
        with coord.transaction([a, b]) as txn:
            ta, tb = txn.tables
            ta.append(mk_rows(spark, 1, tag=f"r{i}"), batch_id=f"fa-{i}")
            tb.append(mk_rows(spark, 1, tag=f"r{i}"), batch_id=f"fb-{i}")
    front = coord.consistent_frontier([a, b])
    assert front == {a.root: 3, b.root: 3}
    assert coord.prune_done(keep_last=1) == 2
    # pruned records are gone; the survivor still has its done marker
    recs = coord._records()
    assert len(recs) == 1
    assert coord.recover() == 0


def test_write_audit_publish_pattern(spark, pair):
    """WAP: inside a transaction the member handle reads its STAGED
    state (data files exist, manifests unpublished) — an audit query
    can inspect the would-be commit and abort it by raising; readers
    elsewhere never see an unaudited row."""
    a, b, coord = pair

    def load_and_audit(min_rows):
        with coord.transaction([a]) as txn:
            (ta,) = txn.tables
            ta.append(mk_rows(spark, 3, tag="cand"), batch_id=f"wap-{min_rows}")
            staged_count = ta.read().count()  # audit sees the staged state
            assert LakeTable.load(spark, a.root).read().count() == 0  # others do not (pre-publish)
            if staged_count < min_rows:
                raise ValueError(f"audit failed: {staged_count} < {min_rows}")

    with pytest.raises(TxnAborted, match="audit failed"):
        load_and_audit(min_rows=10)
    assert a.refresh().read().count() == 0  # aborted: nothing published

    load_and_audit(min_rows=3)  # audit passes -> published
    assert a.refresh().read().count() == 3


def test_cdc_runner_inside_txn(spark, pair):
    """The full CDCRunner (discovery, dedup, side outputs, retry
    machinery) stages inside a transaction: its merge to table A and a
    bulk append to table B publish atomically, and retention is
    refused while staged (its physical deletes cannot abort)."""
    from dbp_etl_spark.cdc import CDCRunner

    a, b, coord = pair
    log = mk_rows(spark, 8).withColumn("op", F.lit("insert")).withColumn(
        "batch_id", F.lit(0).cast("long")
    )
    with pytest.raises(TxnAborted, match="inside a transaction"):
        with coord.transaction([a, b]) as txn:
            ta, tb = txn.tables
            CDCRunner(ta, salt_buckets=4, retry_conflicts=2).run(log)
            ta.expire_snapshots(keep_last=1)  # refused → aborts the group
    # the expire refusal aborted the WHOLE group — atomicity holds
    assert (a.refresh().snapshot_id, b.refresh().snapshot_id) == (0, 0)

    with coord.transaction([a, b]) as txn:
        ta, tb = txn.tables
        CDCRunner(ta, salt_buckets=4, retry_conflicts=2).run(log)
        tb.append(mk_rows(spark, 2, tag="s"), batch_id="side")
    a2, b2 = a.refresh(), b.refresh()
    assert a2.read().count() == 8 and b2.read().count() == 2
    assert a2.is_committed(0) and b2.is_committed("side")


def test_mor_merge_inside_txn(spark, tmp_path):
    """A merge-on-read MERGE (delta-file commit) stages inside a
    transaction like a copy-on-write one: nothing visible on abort,
    the delta commit and a sibling-table write publish together."""
    from dbp_etl_spark.cdc.merge import merge_batch

    m = LakeTable.create(
        spark,
        str(tmp_path / "m"),
        TableSchema.from_struct(PAGES),
        key="url",
        num_buckets=4,
        merge_on_read=True,
    )
    b = LakeTable.create(
        spark, str(tmp_path / "b"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    coord = TxnCoordinator(str(tmp_path / "_txn"))
    batch = mk_rows(spark, 5).withColumn("op", F.lit("insert"))

    # abort path: the staged delta commit must vanish
    with pytest.raises(TxnAborted):
        with coord.transaction([m, b]) as txn:
            tm, tb = txn.tables
            merge_batch(tm, batch, batch_id="b1", salt_buckets=4)
            raise TxnAborted("audit failed")
    m = m.refresh()
    assert m.read().count() == 0 and not m.is_committed("b1")

    # commit path: delta files + sibling append publish atomically
    with coord.transaction([m, b]) as txn:
        tm, tb = txn.tables
        merge_batch(tm, batch, batch_id="b1", salt_buckets=4)
        tb.append(mk_rows(spark, 3), batch_id="b-side")
    m, b = m.refresh(), b.refresh()
    assert m.read().count() == 5 and m.is_committed("b1")
    assert any(f.get("delta") for f in m.manifest["files"])
    assert b.read().count() == 3
