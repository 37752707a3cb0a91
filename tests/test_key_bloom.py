"""Manifest-level per-file key blooms (Iceberg-puffin analog).

The scale claim: a point lookup (WHERE url = ...) narrows to the key's
hash bucket, then DROPS the bucket's files that provably lack the key
at plan time — from a few-KB sidecar, before any footer or row is
read. No false negatives (results always exactly equal the unpruned
read), and GC treats sidecars as part of their data file.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.lake import LakeTable, TableSchema

ST = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def _rows(spark, lo, hi):
    import datetime

    return spark.createDataFrame(
        [
            (f"https://x/{i}", datetime.datetime(2024, 1, 1 + i % 25), f"d{i}")
            for i in range(lo, hi)
        ],
        ST,
    )


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bloom_lake"))
    t = LakeTable.create(
        spark,
        f"{root}/t",
        TableSchema.from_struct(ST),
        key="url",
        num_buckets=2,  # few buckets => many files per bucket => bloom matters
        manifest_bloom_key=True,
    )
    for j in range(4):
        t = t.append(_rows(spark, j * 50, (j + 1) * 50), batch_id=f"b{j}")
    return t


def test_sidecars_written_and_referenced(table):
    entries = table.manifest["files"]
    assert entries and all(e.get("kbloom") for e in entries)
    for e in entries:
        assert os.path.exists(os.path.join(table.root, e["kbloom"]["path"]))
        assert e["kbloom"]["m"] >= 1024


def test_point_lookup_prunes_files_within_bucket(table):
    # each key exists in exactly ONE of the 4 append files of its bucket
    url = "https://x/7"
    cand = table.candidate_files(where=[("url", "=", url)])
    bucket_files = [
        f
        for f in table.manifest["files"]
        if f["bucket"] == cand[0]["bucket"]
    ]
    assert len(bucket_files) >= 4  # several files in the bucket…
    assert len(cand) < len(bucket_files)  # …and the bloom dropped some
    [r] = table.read(where=[("url", "=", url)]).collect()
    assert r["text"] == "d7"


def test_lookup_results_always_exact(table):
    probes = [f"https://x/{i}" for i in (0, 13, 99, 150, 199)] + ["https://nope/1"]
    for u in probes:
        got = {r["url"] for r in table.read(where=[("url", "=", u)]).collect()}
        expect = {r["url"] for r in table.read().filter(F.col("url") == u).collect()}
        assert got == expect
    # missing key: every file of the bucket is provably absent
    assert table.candidate_files(where=[("url", "=", "https://nope/1")]) == []


def test_in_predicate_unions_blooms(table):
    urls = ["https://x/3", "https://x/177"]
    got = {
        r["url"] for r in table.read(where=[("url", "in", urls)]).collect()
    }
    assert got == set(urls)
    cand = table.candidate_files(where=[("url", "in", urls)])
    assert cand  # kept the possibly-matching files
    all_bucket_files = [
        f
        for f in table.manifest["files"]
        if f["bucket"] in {c["bucket"] for c in cand}
    ]
    assert len(cand) < len(all_bucket_files)


def test_bloom_prunes_on_mor_deltas_without_resurrection(spark, tmp_path):
    import datetime

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        TableSchema.from_struct(ST),
        key="url",
        num_buckets=2,
        manifest_bloom_key=True,
        merge_on_read=True,
    )
    t = t.append(_rows(spark, 0, 40), batch_id="base")
    up = spark.createDataFrame(
        [("https://x/5", datetime.datetime(2024, 6, 1), "NEW", False)],
        "url string, warc_ts timestamp, text string, _deleted boolean",
    )
    buckets = sorted(
        r["b"] for r in up.select(t.bucket_expr("url").alias("b")).distinct().collect()
    )
    t = t.write_deltas(up, buckets, "d1")
    # updated key: the delta file must survive the bloom => newest wins
    [r] = t.read(where=[("url", "=", "https://x/5")]).collect()
    assert r["text"] == "NEW"
    # un-updated keys: the delta file blooms absent and is dropped,
    # base values survive (no resurrection, no loss)
    for i in (0, 3, 17):
        [r2] = t.read(where=[("url", "=", f"https://x/{i}")]).collect()
        assert r2["text"] == f"d{i}"


def test_gc_keeps_live_sidecars_and_reclaims_dead_ones(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        TableSchema.from_struct(ST),
        key="url",
        num_buckets=2,
        manifest_bloom_key=True,
    )
    t = t.append(_rows(spark, 0, 30), batch_id="b0")
    old_sidecars = [
        os.path.join(t.root, e["kbloom"]["path"]) for e in t.manifest["files"]
    ]
    # rewrite everything, expire history: old files AND their sidecars go
    t = t.compact("c1", sort_by=["url"])
    new_sidecars = [
        os.path.join(t.root, e["kbloom"]["path"]) for e in t.manifest["files"]
    ]
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files(grace_sec=0.0)
    assert all(os.path.exists(p) for p in new_sidecars)
    assert all(not os.path.exists(p) for p in old_sidecars)
    # table still exact after GC
    assert t.refresh().read().count() == 30
