"""Incremental table-to-table replication (cdc/replicate.py).

Property under test: after sync(), the replica equals
``source.read()`` (optionally filtered/projected/transformed) — with
the apply driven ONLY by the change feed between the cursor and the
head, never a full re-read; and every sync is exactly-once under
replay (ledger-keyed), with the cursor recovered from the target's own
ledger across replicator restarts and ledger pruning.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.cdc import CDCRunner, TableReplicator, generate_changes
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


def mk(spark, tmp_path, name, schema=PAGES, **kw):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        TableSchema.from_struct(schema),
        key="url",
        num_buckets=kw.pop("num_buckets", 8),
        **kw,
    )


def churn(table, spark, n_events, n_urls, n_batches, seed):
    """Apply a deterministic change stream; returns the refreshed handle.

    Batch ids are namespaced by seed so successive churns are new
    batches (same ids would ledger-skip as replays)."""
    ev = generate_changes(spark, n_events, n_urls, n_batches=n_batches, seed=seed)
    ev = ev.withColumn(
        "batch_id", F.concat(F.lit(f"s{seed}-"), F.col("batch_id").cast("string"))
    )
    r = CDCRunner(table)
    r.run(ev)
    return r.table.refresh()


def test_incremental_sync_tracks_source(spark, tmp_path):
    src = mk(spark, tmp_path, "src")
    tgt = mk(spark, tmp_path, "tgt", num_buckets=4)  # layouts may differ
    src = churn(src, spark, 1200, 50, 3, seed=1)
    rep = TableReplicator(src, tgt, name="pages")
    r1 = rep.sync()
    assert not r1.skipped and r1.counts["upsert"] > 0
    assert rep.target.state_hash() == src.state_hash()
    # source moves on; the next sync applies ONLY the feed delta
    src = churn(rep.source, spark, 1200, 50, 3, seed=2)
    r2 = rep.sync()
    assert r2.mode == "cdf" and r2.from_snapshot == r1.to_snapshot
    assert rep.target.state_hash() == src.refresh().state_hash()
    # no new source commits -> noop, no target commit
    before = rep.target.snapshot_id
    r3 = rep.sync()
    assert r3.skipped and rep.target.refresh().snapshot_id == before


def test_sync_is_exactly_once_under_replay(spark, tmp_path):
    src = mk(spark, tmp_path, "src")
    tgt = mk(spark, tmp_path, "tgt")
    src = churn(src, spark, 800, 40, 2, seed=3)
    rep = TableReplicator(src, tgt, name="x")
    r1 = rep.sync()
    # a fresh replicator (crash-restart) recovers the cursor from the
    # target ledger and replays the same range as a no-op
    rep2 = TableReplicator(src, tgt.refresh(), name="x")
    assert rep2.cursor() == r1.to_snapshot
    r2 = rep2.sync(r1.to_snapshot)
    assert r2.skipped
    assert rep2.target.state_hash() == src.state_hash()


def test_filtered_replica_deletes_moveouts(spark, tmp_path):
    """where=: the replica equals source.filter(pred) even as rows move
    in and out of the predicate across updates."""
    src = mk(spark, tmp_path, "src")
    tgt = mk(spark, tmp_path, "tgt")
    pred = "pmod(xxhash64(text), 3) = 0"  # flips as content changes
    src = churn(src, spark, 1500, 60, 3, seed=5)
    rep = TableReplicator(src, tgt, name="f", where=pred)
    rep.sync()
    expect = src.read().filter(F.expr(pred))
    got = rep.target.read()
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0
    # churn again: some urls' text changes -> predicate flips -> the
    # replica must DELETE move-outs, not just upsert move-ins
    src = churn(rep.source, spark, 1500, 60, 3, seed=6)
    r = rep.sync()
    assert r.counts["delete"] > 0
    expect = src.refresh().read().filter(F.expr(pred))
    got = rep.target.read()
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0


def test_mor_target_writes_deltas_only(spark, tmp_path):
    src = mk(spark, tmp_path, "src")
    tgt = mk(spark, tmp_path, "tgt", merge_on_read=True)
    src = churn(src, spark, 1000, 50, 2, seed=7)
    rep = TableReplicator(src, tgt, name="m")
    rep.sync()
    src = churn(rep.source, spark, 1000, 50, 2, seed=8)
    rep.sync()
    # incremental syncs landed as delta commits (base untouched)
    assert any(f.get("delta") for f in rep.target.manifest["files"])
    assert rep.target.state_hash() == src.refresh().state_hash()
    # folding the deltas preserves state
    t = rep.target.compact("fold")
    assert t.state_hash() == src.state_hash()


def test_projected_transformed_replica(spark, tmp_path):
    slim = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("text_len", T.LongType()),
        ]
    )
    src = mk(spark, tmp_path, "src")
    tgt = mk(spark, tmp_path, "tgt", schema=slim)
    src = churn(src, spark, 900, 45, 2, seed=9)
    rep = TableReplicator(
        src,
        tgt,
        name="slim",
        transform=lambda df: df.withColumn("text_len", F.octet_length("text").cast("long")),
    )
    rep.sync()
    expect = src.read().select(
        "url", "warc_ts", F.octet_length("text").cast("long").alias("text_len")
    )
    assert rep.target.read().exceptAll(expect).count() == 0
    assert rep.target.read().count() == expect.count()


def test_bootstrap_after_source_history_expired(spark, tmp_path):
    src = mk(spark, tmp_path, "src")
    src = churn(src, spark, 1000, 40, 4, seed=11)
    src.expire_snapshots(keep_last=2)
    src = src.refresh()
    assert src.min_retained_snapshot > 0
    tgt = mk(spark, tmp_path, "tgt")
    rep = TableReplicator(src, tgt, name="b")
    r = rep.sync()
    assert r.mode == "bootstrap"
    assert rep.target.state_hash() == src.state_hash()
    # and incremental from there on
    src = churn(rep.source, spark, 600, 40, 2, seed=12)
    r2 = rep.sync()
    assert r2.mode == "cdf"
    assert rep.target.state_hash() == src.refresh().state_hash()


def test_cursor_behind_retention_raises(spark, tmp_path):
    src = mk(spark, tmp_path, "src")
    tgt = mk(spark, tmp_path, "tgt")
    src = churn(src, spark, 500, 30, 2, seed=13)
    rep = TableReplicator(src, tgt, name="l")
    rep.sync()
    # source churns far ahead and expires history past the cursor
    src = churn(rep.source, spark, 2000, 30, 6, seed=14)
    src.expire_snapshots(keep_last=1)
    with pytest.raises(SnapshotExpired, match="bootstrap a fresh target"):
        rep.sync()


def test_sync_each_snapshot_prunable_cursor(spark, tmp_path):
    """Per-snapshot syncs produce contiguous ledger ids; after target
    ledger pruning the cursor survives via the prefix watermark."""
    src = mk(spark, tmp_path, "src")
    tgt = mk(spark, tmp_path, "tgt")
    src = churn(src, spark, 800, 30, 4, seed=15)
    rep = TableReplicator(src, tgt, name="w")
    results = rep.sync_each_snapshot()
    applied = [r for r in results if not r.skipped]
    assert len(applied) >= 2  # one commit per source snapshot
    assert rep.target.state_hash() == src.state_hash()
    cur_before = rep.cursor()
    # churn the target's ledger horizon: expire aggressively
    t = rep.target
    t.expire_snapshots(keep_last=1)
    t = t.refresh()
    rep2 = TableReplicator(src, t, name="w")
    assert rep2.cursor() == cur_before
    assert rep2.sync().skipped


def test_streaming_source_feeds_replica(spark, tmp_path):
    """The full fan-out chain: a structured-streaming tail MERGEs into
    the source table, and a replica synced from the source's change
    feed converges to the same state — proving the changes-out path
    composes with the streaming changes-in path."""
    from dbp_etl_spark.streaming import run_stream

    events = generate_changes(spark, 1500, 60, n_batches=3, seed=21)
    src_dir = str(tmp_path / "changes")
    events.repartition(3, "batch_id").write.parquet(src_dir)
    src = mk(spark, tmp_path, "src")
    q = run_stream(
        spark,
        src_dir,
        src,
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    src = src.refresh()
    tgt = mk(spark, tmp_path, "tgt")
    rep = TableReplicator(src, tgt, name="s")
    rep.sync()
    assert rep.target.state_hash() == src.state_hash()


def test_key_mismatch_rejected(spark, tmp_path):
    src = mk(spark, tmp_path, "src")
    other = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
        ]
    )
    bad = LakeTable.create(
        spark, str(tmp_path / "bad"), TableSchema.from_struct(other), key="doc_id", num_buckets=2
    )
    with pytest.raises(ValueError, match="must match source"):
        TableReplicator(src, bad)


def test_missing_replica_column_errors_clearly(spark, tmp_path):
    slim = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("nope", T.StringType()),
        ]
    )
    src = mk(spark, tmp_path, "src")
    tgt = mk(spark, tmp_path, "tgt", schema=slim)
    src = churn(src, spark, 300, 20, 1, seed=17)
    rep = TableReplicator(src, tgt, name="e")
    with pytest.raises(ValueError, match="absent from the change feed"):
        rep.sync()
