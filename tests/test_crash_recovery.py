"""Crash-injection: a failure between the data write and the manifest
commit must leave the table unchanged (orphan files only), and a retry
must succeed with correct final state — the atomicity half of
exactly-once."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.cdc import CDCRunner, generate_changes, merge_batch
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


def test_crash_between_write_and_commit(spark, tmp_path, monkeypatch):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    events = generate_changes(spark, 500, 50, n_batches=2, seed=9)
    b0 = events.filter(F.col("batch_id") == 0)
    b1 = events.filter(F.col("batch_id") == 1)
    merge_batch(t, b0, 0)
    h_after_b0 = t.state_hash()
    snap_after_b0 = t.snapshot_id

    # inject a crash: the data files get written, the commit never lands
    # (manifest publish goes through fs.create_text_exclusive now)
    real_create = t._fs.create_text_exclusive

    def boom(path, content):
        if path.split("/")[-1].startswith("v") and path.endswith(".json"):
            raise RuntimeError("simulated crash before manifest publish")
        real_create(path, content)

    monkeypatch.setattr(t._fs, "create_text_exclusive", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_batch(t, b1, 1)
    monkeypatch.undo()

    # table is untouched: same snapshot, same state, batch not committed
    t2 = LakeTable.load(spark, t.root)
    assert t2.snapshot_id == snap_after_b0
    assert t2.state_hash() == h_after_b0
    assert not t2.is_committed(1)

    # retry applies cleanly; state equals an uncrashed run
    merge_batch(t2, b1, 1)
    assert t2.is_committed(1)
    t_clean = LakeTable.create(
        spark, str(tmp_path / "clean"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    CDCRunner(t_clean).run(events)
    assert t2.state_hash() == t_clean.state_hash()


def test_torn_version_pointer_impossible(spark, tmp_path):
    """The VERSION pointer swings via os.replace (atomic on POSIX):
    readers either see the old snapshot id or the new one, and the
    manifest it points to is always fully written (fsync before
    replace). Sanity-check the invariant: every historical manifest
    referenced by VERSION parses."""
    import json
    import os

    t = LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    CDCRunner(t).run(generate_changes(spark, 300, 30, n_batches=3, seed=10))
    meta = os.path.join(t.root, "_meta")
    with open(os.path.join(meta, "VERSION")) as f:
        head = int(f.read())
    for i in range(head + 1):
        p = os.path.join(meta, f"v{i}.json")
        if os.path.exists(p):
            with open(p) as f:
                m = json.load(f)
            assert m["snapshot_id"] == i
    assert head == t.snapshot_id


def test_crash_between_manifest_and_pointer_recovers(spark, tmp_path, monkeypatch):
    """A crash AFTER v{N}.json is created but BEFORE the VERSION pointer
    swings must not brick the table: the manifest create IS the commit
    point, so load() rolls the pointer forward and the batch is simply
    committed — a retry no-ops (exactly-once preserved)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    events = generate_changes(spark, 400, 40, n_batches=1, seed=3)
    real_write = t._fs.write_text

    def boom(path, content):
        if path.endswith("VERSION"):
            raise RuntimeError("simulated crash before pointer write")
        real_write(path, content)

    monkeypatch.setattr(t._fs, "write_text", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        merge_batch(t, events, 0)
    monkeypatch.undo()

    # v1.json exists; load() rolls the pointer forward: committed
    t2 = LakeTable.load(spark, t.root)
    assert t2.snapshot_id == 1
    assert t2.is_committed(0)
    # retry no-ops (ledger), state matches a clean run
    assert merge_batch(t2, events, 0).skipped
    t_clean = LakeTable.create(
        spark, str(tmp_path / "clean2"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    merge_batch(t_clean, events, 0)
    assert t2.state_hash() == t_clean.state_hash()


def test_torn_manifest_is_not_a_commit(spark, tmp_path):
    """A crash mid-manifest-create can leave a partial (unparsable)
    v{N}.json on stores without atomic create. Roll-forward must stop
    at it (it is NOT a commit) and a retrying writer must replace it
    and commit successfully."""
    t = LakeTable.create(
        spark, str(tmp_path / "torn"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )
    events = generate_changes(spark, 300, 30, n_batches=1, seed=7)
    merge_batch(t, events.filter(F.col("batch_id") == 0), 0)
    assert t.snapshot_id == 1

    # simulate a torn create of the NEXT snapshot's manifest
    import os

    torn = os.path.join(t.root, "_meta", "v2.json")
    with open(torn, "w") as f:
        f.write('{"snapshot_id": 2, "files": [')  # truncated JSON

    # readers: roll-forward stops at the torn file
    t2 = LakeTable.load(spark, t.root)
    assert t2.snapshot_id == 1
    assert t2.read().count() == t.read().count()

    # writer: retry replaces the torn manifest and commits
    more = generate_changes(spark, 300, 30, n_batches=1, seed=9)
    merge_batch(t2, more, "b2")
    assert t2.snapshot_id == 2
    assert t2.is_committed("b2")
    t3 = LakeTable.load(spark, t.root)
    assert t3.snapshot_id == 2
    assert t3.state_hash() == t2.state_hash()
