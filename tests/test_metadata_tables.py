"""Metadata tables: files_df / snapshots_df / plan_compaction answer
operational questions from the manifest alone (Iceberg `table.files` /
`table.snapshots` analogs) — no data scan, so they stay cheap at any
table size."""

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


def mk(spark, tmp_path, name, **kw):
    return LakeTable.create(
        spark,
        str(tmp_path / name),
        TableSchema.from_struct(PAGES),
        key="url",
        num_buckets=4,
        **kw,
    )


def ev(spark, rows):
    return spark.createDataFrame(
        rows, "url string, ts long, html binary, op string"
    ).select("url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "op")


def _apply(table, batch, bid):
    merge_batch(table, batch, batch_id=bid)
    return table.refresh()


def test_files_df_matches_manifest_and_filesystem(spark, tmp_path):
    # stats_columns => footer row counts land in the manifest, so the
    # metadata table can report n_rows without touching data
    t = mk(spark, tmp_path, "pages", stats_columns=["warc_ts"])
    t = _apply(t, ev(spark, [(f"u{i}", 100, b"<p>x</p>", "insert") for i in range(20)]), 1)
    files = t.files_df().collect()
    assert len(files) == len(t.manifest["files"]) > 0
    for r in files:
        assert r["size_bytes"] and r["size_bytes"] > 0
        assert r["n_rows"] and r["n_rows"] > 0  # footer stats recorded at write
        assert not r["is_delta"] and r["delta_seq"] is None
    # metadata row count == actual live row count
    assert sum(r["n_rows"] for r in files) == t.read().count()


def test_files_df_flags_mor_deltas(spark, tmp_path):
    t = mk(spark, tmp_path, "mor", merge_on_read=True, max_delta_commits=100)
    t = _apply(t, ev(spark, [(f"u{i}", 100, b"<p>x</p>", "insert") for i in range(8)]), 1)
    t = _apply(t, ev(spark, [("u1", 200, b"<p>y</p>", "update")]), 2)
    files = t.files_df()
    deltas = files.filter("is_delta").collect()
    assert deltas and all(r["delta_seq"] is not None for r in deltas)
    # flag agrees file-for-file with the manifest
    want_delta = {f["path"] for f in t.manifest["files"] if f.get("delta")}
    got_delta = {r["path"] for r in deltas}
    assert got_delta == want_delta
    # compaction folds deltas into base files, and the flag follows
    t = t.compact("fold-1")
    assert t.files_df().filter("is_delta").count() == 0


def test_snapshots_df_tracks_history(spark, tmp_path):
    t = mk(spark, tmp_path, "hist")
    t = _apply(t, ev(spark, [("u1", 100, b"<p>a</p>", "insert")]), 1)
    t = _apply(t, ev(spark, [("u2", 200, b"<p>b</p>", "insert")]), 2)
    snaps = {r["snapshot_id"]: r for r in t.snapshots_df().collect()}
    assert set(snaps) == {0, 1, 2}
    assert snaps[1]["parent_id"] == 0 and snaps[2]["parent_id"] == 1
    assert snaps[2]["operation"] == "merge"
    assert snaps[2]["n_files"] == len(t.manifest["files"])


def test_plan_compaction_picks_fragmented_buckets_only(spark, tmp_path):
    t = mk(spark, tmp_path, "frag", merge_on_read=True, max_delta_commits=100)
    t = _apply(t, ev(spark, [(f"u{i}", 100, b"<p>x</p>", "insert") for i in range(16)]), 1)
    # pile delta commits onto one key -> its bucket accumulates files
    hot = "u3"
    for i in range(6):
        t = _apply(t, ev(spark, [(hot, 200 + i, b"<p>v</p>", "update")]), 2 + i)
    per_bucket: dict[int, int] = {}
    for f in t.manifest["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    hot_buckets = {b for b, n in per_bucket.items() if n > 4}
    plan = t.plan_compaction(max_files_per_bucket=4)
    assert set(plan) == hot_buckets and plan  # only the fragmented bucket(s)
    assert set(plan) != set(per_bucket)  # and not the whole table
    # compacting exactly the planned buckets clears the plan
    t = t.compact("maint-1", buckets=plan)
    assert t.plan_compaction(max_files_per_bucket=4) == []
    # state unchanged by compaction
    assert t.read().count() == 16


def test_plan_compaction_small_file_threshold(spark, tmp_path):
    t = mk(spark, tmp_path, "small")
    # two separate merges -> copy-on-write rewrites touched buckets;
    # untouched buckets keep one file each
    t = _apply(t, ev(spark, [(f"u{i}", 100, b"<p>x</p>", "insert") for i in range(12)]), 1)
    t = _apply(t, ev(spark, [(f"w{i}", 200, b"<p>y</p>", "insert") for i in range(12)]), 2)
    multi = {
        b
        for b in range(4)
        if sum(1 for f in t.manifest["files"] if f["bucket"] == b) >= 2
    }
    # every file here is tiny, so a huge threshold selects all multi-file buckets
    assert set(t.plan_compaction(max_files_per_bucket=999, small_file_bytes=10**9)) == multi
    # and a zero threshold selects none
    assert t.plan_compaction(max_files_per_bucket=999, small_file_bytes=0) == []
