"""Incremental bucket-count migration (B -> k*B online layout evolution).

rebucket() is one atomic full rewrite; migrate_to_buckets() spreads the
same rewrite over many commits (pigeonhole: old bucket b = union of new
buckets {b + i*B}) while readers and MERGE writers keep running under
the old spec. These tests pin: content invariance at every step, the
metadata-only flip, writer-induced un-migration converging anyway,
compaction not undoing migrated splits, MOR delta folding, and rollback
restoring migration progress with the files it describes.
"""

import pytest
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


def mk(spark, tmp_path, name="t", buckets=4, **kw):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        TableSchema.from_struct(PAGES),
        key="url",
        num_buckets=buckets,
        **kw,
    )


def ev(spark, rows):
    return spark.createDataFrame(
        rows, "url string, ts long, html binary, op string"
    ).select("url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "op")


def seed(spark, t, n=40, ts=100):
    rows = [(f"u{i}", ts, f"<p>page {i}</p>".encode(), "insert") for i in range(n)]
    merge_batch(t, ev(spark, rows), f"seed-{ts}")
    return t.refresh()


def test_incremental_migration_steps_then_metadata_flip(spark, tmp_path):
    t = seed(spark, mk(spark, tmp_path))
    h = t.state_hash()
    steps = 0
    while t.migration_status() is None or t.migration_status()["remaining"]:
        t = t.migrate_to_buckets(8, f"mig-{steps}", max_buckets=1)
        steps += 1
        assert t.state_hash() == h  # content-invariant at EVERY step
        if t.num_buckets == 8:
            break
        status = t.migration_status()
        assert status["to"] == 8 and status["migrated"] == min(steps, status["total"])
    assert t.num_buckets == 8
    assert t.migration_status() is None
    assert steps >= 4  # one step per old bucket + possibly the flip
    # post-flip: entries carry new-spec ids, no tags remain
    assert all("new_bucket" not in f for f in t.manifest["files"])
    assert {f["bucket"] for f in t.manifest["files"]} <= set(range(8))
    # MERGE under the new spec lands in the right bucket (point lookup)
    merge_batch(t, ev(spark, [("u1", 200, b"<p>v2</p>", "update")]), "post")
    t = t.refresh()
    got = t.read(where=[("url", "=", "u1")]).collect()
    assert len(got) == 1 and bytes(got[0]["html"]) == b"<p>v2</p>"


def test_migration_validates_target(spark, tmp_path):
    t = seed(spark, mk(spark, tmp_path))
    with pytest.raises(ValueError, match="integer multiple"):
        t.migrate_to_buckets(6, "bad")  # not a multiple of 4
    snap = t.snapshot_id
    assert t.migrate_to_buckets(4, "same").snapshot_id == snap  # no-op at target
    with pytest.raises(ValueError, match="integer multiple"):
        t.migrate_to_buckets(2, "shrink")
    t = t.migrate_to_buckets(8, "m0", max_buckets=1)
    with pytest.raises(ValueError, match="already in progress"):
        t.migrate_to_buckets(16, "other-target")


def test_writer_unmigrates_bucket_and_migration_converges(spark, tmp_path):
    t = seed(spark, mk(spark, tmp_path))
    t = t.migrate_to_buckets(8, "m0", max_buckets=2)
    migrated = set(t.manifest["migration"]["done"])
    assert len(migrated) == 2
    # a MERGE touching a migrated bucket re-dirties it
    victim = sorted(migrated)[0]
    # pick a key that hashes into the victim bucket
    probe = spark.createDataFrame([(f"u{i}",) for i in range(200)], "url string")
    key_rows = probe.withColumn("b", t.bucket_expr("url")).collect()
    url = next(r["url"] for r in key_rows if r["b"] == victim)
    merge_batch(t, ev(spark, [(url, 300, b"<p>dirty</p>", "update")]), "dirty")
    t = t.refresh()
    assert victim not in set(t.manifest["migration"]["done"])
    h = t.state_hash()
    # keep stepping: the migration converges and flips
    for i in range(10):
        if t.num_buckets == 8:
            break
        t = t.migrate_to_buckets(8, f"m{i+1}", max_buckets=2)
    assert t.num_buckets == 8
    assert t.state_hash() == h
    got = t.read(where=[("url", "=", url)]).collect()
    assert bytes(got[0]["html"]) == b"<p>dirty</p>"


def test_compact_does_not_undo_migrated_splits(spark, tmp_path):
    t = seed(spark, mk(spark, tmp_path))
    t = t.migrate_to_buckets(8, "m0", max_buckets=2)
    migrated = set(t.manifest["migration"]["done"])
    files_of = lambda b: [f for f in t.manifest["files"] if f["bucket"] == b]
    split_before = {b: len(files_of(b)) for b in migrated}
    t = t.compact("c0")
    for b in migrated:
        assert len(files_of(b)) == split_before[b]  # untouched
    assert set(t.manifest["migration"]["done"]) == migrated


def test_migration_folds_mor_deltas(spark, tmp_path):
    t = seed(spark, mk(spark, tmp_path, buckets=4, merge_on_read=True))
    merge_batch(t, ev(spark, [("u1", 200, b"<p>v2</p>", "update")]), "churn")
    t = t.refresh()
    assert any(f.get("delta") for f in t.manifest["files"])
    h = t.state_hash()
    for i in range(6):
        if t.num_buckets == 8:
            break
        t = t.migrate_to_buckets(8, f"m{i}", max_buckets=2)
    assert t.num_buckets == 8
    assert not any(f.get("delta") for f in t.manifest["files"])
    assert t.state_hash() == h


def test_rollback_restores_migration_progress(spark, tmp_path):
    t = seed(spark, mk(spark, tmp_path))
    t = t.migrate_to_buckets(8, "m0", max_buckets=2)
    mid_snap = t.snapshot_id
    mid_done = list(t.manifest["migration"]["done"])
    for i in range(6):
        if t.num_buckets == 8:
            break
        t = t.migrate_to_buckets(8, f"m{i+1}", max_buckets=2)
    assert t.num_buckets == 8 and t.migration_status() is None
    t = t.rollback_to(mid_snap)
    assert t.num_buckets == 4
    assert t.manifest["migration"]["done"] == mid_done
    # and the restored migration can finish again
    for i in range(6):
        if t.num_buckets == 8:
            break
        t = t.migrate_to_buckets(8, f"r{i}", max_buckets=2)
    assert t.num_buckets == 8


def test_point_lookup_prunes_to_subbucket_mid_migration(spark, tmp_path):
    """Before the flip, a key-equality read on a migrated bucket scans
    exactly its 1-of-k new-spec file (plus nothing else); unmigrated
    buckets still scan whole. Result identical either way."""
    t = seed(spark, mk(spark, tmp_path), n=80)
    t = t.migrate_to_buckets(8, "m0", max_buckets=2)
    migrated = set(t.manifest["migration"]["done"])
    probe = spark.createDataFrame([(f"u{i}",) for i in range(80)], "url string")
    key_rows = probe.withColumn("b", t.bucket_expr("url")).collect()
    url = next(r["url"] for r in key_rows if r["b"] in migrated)
    cand = t.candidate_files(where=[("url", "=", url)])
    assert len(cand) == 1 and "new_bucket" in cand[0]
    got = t.read(where=[("url", "=", url)]).collect()
    assert len(got) == 1 and got[0]["url"] == url
    # an unmigrated bucket's lookup is old-spec-wide, still correct
    url2 = next(r["url"] for r in key_rows if r["b"] not in migrated)
    got2 = t.read(where=[("url", "=", url2)]).collect()
    assert len(got2) == 1 and got2[0]["url"] == url2
