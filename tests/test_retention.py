"""Snapshot expiry, ledger pruning, orphan-file GC, bounded metadata.

The 10^10-design-point hygiene layer: without it every commit rewrites
a manifest that grows with the FULL history (ledger entry per batch,
file list per snapshot) and storage accretes every superseded data
file forever. Reference analog: the cleanup/replay discipline of
/root/reference/load/TestCleanup.py:10-33.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.lake import LakeTable, SnapshotExpired, TableSchema
from tests.test_lake import PAGES, mk_rows


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "pages"), TableSchema.from_struct(PAGES), key="url", num_buckets=4
    )


def _meta_files(root):
    return sorted(f for f in os.listdir(os.path.join(root, "_meta")) if f.startswith("v"))


def _data_files(root):
    out = []
    for dirpath, _dirs, files in os.walk(os.path.join(root, "data")):
        out += [os.path.join(dirpath, f) for f in files]
    return out


def test_expire_snapshots_bounds_manifests_and_storage(spark, table):
    t = table
    for i in range(8):
        t = t.append(mk_rows(spark, 5, tag=f"b{i}"), batch_id=i)
    pre_hash = t.state_hash()
    n_files_pre = len(_data_files(t.root))

    stats = t.expire_snapshots(keep_last=3)
    assert stats["min_retained_snapshot"] == 6  # head was 8
    assert stats["expired_manifests"] == list(range(6))
    # append-only: every snapshot's files are still referenced by the
    # retained head, so nothing is deletable
    assert stats["deleted_files"] == 0
    assert len(_data_files(t.root)) == n_files_pre
    assert _meta_files(t.root) == ["v6.json", "v7.json", "v8.json", "v9.json"]
    assert t.state_hash() == pre_hash
    assert LakeTable.load(spark, t.root).state_hash() == pre_hash

    # time travel: retained ok, expired raises cleanly
    assert t.read(snapshot_id=7).count() > 0
    with pytest.raises(SnapshotExpired):
        t.read(snapshot_id=2)


def test_expire_deletes_superseded_bucket_files(spark, table):
    t = table
    rows = mk_rows(spark, 20, tag="x")
    t = t.append(rows, batch_id="seed")
    # overwrite ALL buckets repeatedly: superseded snap dirs become dead
    all_b = list(range(t.num_buckets))
    for i in range(4):
        state = t.read(include_deleted=True)
        t = t.overwrite_buckets(state, all_b, batch_id=i)
    pre_hash = t.state_hash()
    n_pre = len(_data_files(t.root))
    stats = t.expire_snapshots(keep_last=1)
    assert stats["deleted_files"] > 0
    assert len(_data_files(t.root)) < n_pre
    assert t.state_hash() == pre_hash
    # snap dirs of expired-only snapshots are fully gone (empty-dir sweep)
    live_dirs = {
        f["path"].split(os.sep)[1] for f in t.manifest["files"]
    }
    on_disk = set(os.listdir(os.path.join(t.root, "data")))
    assert on_disk == live_dirs


def test_ledger_pruning_keeps_replay_noop(spark, table):
    t = table
    for i in range(6):
        t = t.append(mk_rows(spark, 3, tag=f"b{i}"), batch_id=i)
    t.expire_snapshots(keep_last=2)
    t = t.refresh()
    # pruned ids fell out of the ledger but the watermark keeps them committed
    led = t.manifest["committed_batches"]
    assert all(str(i) not in led for i in range(4))
    assert t.manifest["ledger_watermarks"] == {"": [0, 3]}
    for i in range(6):
        assert t.is_committed(i), i
    assert not t.is_committed(99)
    # replaying a pruned batch id is a no-op commit-skip
    pre = t.state_hash()
    t2 = t.append(mk_rows(spark, 3, tag="b0"), batch_id=0)
    assert t2.snapshot_id == t.snapshot_id
    assert t2.state_hash() == pre


def test_ledger_watermark_prefixes_and_unordered_ids(spark, table):
    t = table
    t = t.append(mk_rows(spark, 2, tag="a"), batch_id="stream-ab-0")
    t = t.append(mk_rows(spark, 2, tag="b"), batch_id="stream-ab-1")
    t = t.append(mk_rows(spark, 2, tag="c"), batch_id="stream-cd-5")
    t = t.append(mk_rows(spark, 2, tag="d"), batch_id="adhoc_backfill")
    t = t.append(mk_rows(spark, 2, tag="e"), batch_id="recent")
    t.expire_snapshots(keep_last=1)
    t = t.refresh()
    wm = t.manifest["ledger_watermarks"]
    assert wm == {"stream-ab-": [0, 1], "stream-cd-": [5, 5]}
    # unordered id survives pruning verbatim (exact membership preserved)
    assert "adhoc_backfill" in t.manifest["committed_batches"]
    assert t.is_committed("stream-ab-0") and t.is_committed("stream-ab-1")
    assert t.is_committed("stream-cd-5") and t.is_committed("adhoc_backfill")
    # other-prefix / above-watermark epochs are NOT claimed
    assert not t.is_committed("stream-cd-6")
    assert not t.is_committed("stream-zz-0")


def test_remove_orphan_files(spark, table):
    t = table.append(mk_rows(spark, 10, tag="x"), batch_id="b")
    pre_hash = t.state_hash()
    # plant crash debris: a write-attempt dir that never published
    orphan_dir = os.path.join(t.root, "data", "snap-99-deadbeef", "_bucket=0")
    os.makedirs(orphan_dir)
    with open(os.path.join(orphan_dir, "part-000.parquet"), "wb") as f:
        f.write(b"not really parquet")
    stray = os.path.join(t.root, "data", "snap-99-deadbeef", "_SUCCESS")
    with open(stray, "w") as f:
        f.write("")
    # grace window protects fresh files (in-flight writer simulation)
    assert t.remove_orphan_files(grace_sec=3600)["removed_files"] == 0
    assert os.path.exists(orphan_dir)
    stats = t.remove_orphan_files(grace_sec=0)
    # planted debris (2) + the live snap dir's own _SUCCESS sidecars
    assert stats["removed_files"] >= 2
    assert not os.path.exists(os.path.join(t.root, "data", "snap-99-deadbeef"))
    # live data untouched
    assert t.state_hash() == pre_hash
    assert t.remove_orphan_files(grace_sec=0)["removed_files"] == 0


def test_commit_cost_stays_o_retained(spark, table):
    """Regression pin for the round-2 scale liability: with periodic
    expiry, manifest bytes / ledger entries / manifest count are bounded
    by the retention window — they do NOT grow with total history."""
    t = table
    sizes = []
    for i in range(24):
        t = t.append(mk_rows(spark, 2, tag=f"b{i}"), batch_id=i)
        if (i + 1) % 8 == 0:
            t.expire_snapshots(keep_last=4)
            t = t.refresh()
            t.compact(batch_id=f"compact-{i}")
            t = t.refresh()
            sizes.append(
                len(json.dumps(t.manifest))
            )
    # ledger bounded by the window, not by 24 batches
    assert len(t.manifest["committed_batches"]) <= 8
    assert len(_meta_files(t.root)) <= 8
    # manifest size flat across cycles (within 2x, not linear growth)
    assert max(sizes) <= 2 * min(sizes)
    # and the data all still reads (append-only: 24 batches x 2 rows)
    assert t.read().count() == 48


def test_runner_inline_expiry_preserves_state(spark, tmp_path):
    """CDCRunner(expire_every=N) interleaves retention with the tail:
    final state identical to a run without expiry, metadata bounded,
    and replaying the whole log afterwards is a full no-op (pruned
    batch ids resolve through the ledger watermark)."""
    from pyspark.sql import types as T

    from dbp_etl_spark.cdc import CDCRunner, generate_changes

    events = generate_changes(spark, 1200, 80, n_batches=6, seed=3)

    def fresh(name):
        return LakeTable.create(
            spark,
            str(tmp_path / name),
            TableSchema.from_struct(
                T.StructType(
                    [
                        T.StructField("url", T.StringType()),
                        T.StructField("warc_ts", T.TimestampType()),
                        T.StructField("html", T.BinaryType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("lang", T.StringType()),
                    ]
                )
            ),
            key="url",
            num_buckets=4,
        )

    t_plain = fresh("plain")
    CDCRunner(t_plain).run(events)
    t_exp = fresh("expired")
    runner = CDCRunner(t_exp, expire_every=2, expire_keep_last=2)
    runner.run(events)
    assert t_exp.state_hash() == t_plain.state_hash()
    assert len(_meta_files(t_exp.root)) < len(_meta_files(t_plain.root))
    assert len(t_exp.manifest["committed_batches"]) <= 4

    # full-log replay: every batch (incl. pruned ids) no-ops
    before = t_exp.snapshot_id
    rep = CDCRunner(t_exp.refresh()).run(events)
    assert rep.n_skipped == 6
    assert t_exp.refresh().snapshot_id == before


def test_expiry_crash_between_commit_and_delete_recovers(spark, table):
    """A crash after the expiry COMMIT but before the manifest deletion
    loop must not leak the expired v{K}.json forever: the next expiry's
    downward scan picks them up."""
    t = table
    for i in range(6):
        t = t.append(mk_rows(spark, 2, tag=f"b{i}"), batch_id=i)

    # simulate the crash: run the commit half of expiry, skip cleanup
    orig_delete = t._fs.delete
    t._fs.delete = lambda *a, **k: False  # deletion "crashes" (no-op)
    t.expire_snapshots(keep_last=2)
    t._fs.delete = orig_delete
    t = t.refresh()
    leaked = [f for f in _meta_files(t.root) if int(f[1:-5]) < t.min_retained_snapshot]
    assert leaked  # the crash left expired manifests behind

    # next expiry run collects them even though min_retained already advanced
    t = t.append(mk_rows(spark, 2, tag="b6"), batch_id=6)
    t.expire_snapshots(keep_last=2)
    t = t.refresh()
    leaked_after = [
        f for f in _meta_files(t.root) if int(f[1:-5]) < t.min_retained_snapshot
    ]
    assert leaked_after == []


def test_ledger_watermark_refuses_gapped_id_spaces(spark, table):
    """Ids pruned into the watermark must form a contiguous range: with
    ids 1,2,3,10,11 a scalar high-watermark of 11 would claim the
    never-applied 5 as committed and silently drop it. The gapped tail
    stays in the ledger verbatim instead."""
    t = table
    for i in (1, 2, 3, 10, 11):
        t = t.append(mk_rows(spark, 2, tag=f"b{i}"), batch_id=i)
    t.expire_snapshots(keep_last=1)
    t = t.refresh()
    assert t.manifest["ledger_watermarks"] == {"": [1, 3]}
    led = t.manifest["committed_batches"]
    assert "10" in led and "11" in led  # post-gap ids kept exactly
    for i in (1, 2, 3, 10, 11):
        assert t.is_committed(i), i
    # the id inside the gap is NOT claimed: it would re-apply, not drop
    assert not t.is_committed(5)
    assert not t.is_committed(0)


def test_expire_snapshots_age_based(spark, tmp_path):
    """older_than_sec keeps every younger-than-cutoff snapshot (mtime-
    derived) with keep_last as the floor."""
    import os
    import time as _time

    from test_merge import PAGES, mk_table
    from dbp_etl_spark.cdc import CDCRunner
    from datetime import datetime, timezone

    t = mk_table(spark, tmp_path, name="age")
    runner = CDCRunner(t)
    for b in range(5):
        df = spark.createDataFrame(
            [
                (
                    f"u{b}",
                    datetime.fromtimestamp(100 + b, tz=timezone.utc),
                    b"<p>x</p>",
                    "update",
                    b,
                )
            ],
            "url string, warc_ts timestamp, html binary, op string, batch_id long",
        )
        runner.run(df)
    t = t.refresh()
    head = t.snapshot_id
    # age the three oldest manifests artificially
    for s in range(0, head - 1):
        p = tmp_path / "age" / "_meta" / f"v{s}.json"
        if p.exists():
            os.utime(p, (_time.time() - 3600, _time.time() - 3600))

    before = t.state_hash()
    t.expire_snapshots(keep_last=1, older_than_sec=600)
    t = t.refresh()
    # the two young pre-expiry snapshots are retained, aged ones expired
    assert t.min_retained_snapshot == head - 1
    assert t.state_hash() == before
    # floor: with a huge keep_last, age changes nothing
    t.expire_snapshots(keep_last=50, older_than_sec=0)
    t = t.refresh()
    assert t.min_retained_snapshot == head - 1  # floor kept everything retained
    assert t.state_hash() == before
