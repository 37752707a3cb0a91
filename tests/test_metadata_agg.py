"""Metadata-only aggregates: count_rows / column_bounds.

The scale claim under test: on a stats-enabled copy-on-write table
with no tombstones, ``SELECT count(*)`` and min/max are answered from
the manifest alone — zero files opened (the Iceberg aggregate-pushdown
analog). Tombstoned files, statless files, and merge-on-read delta
buckets fall back to a scan of JUST those files, and the hybrid answer
is always exactly the scan answer.
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


from dbp_etl_spark.lake import LakeTable, TableSchema

ST = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _batch(spark, month, n, off):
    rows = [
        (
            f"https://x/{i + off}",
            datetime.datetime(2024, month, 1 + (i % 25)),
            f"d{i + off}",
            float(i + off),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ST)


def _mk(spark, root, **kw):
    return LakeTable.create(
        spark,
        root,
        TableSchema.from_struct(ST),
        key="url",
        num_buckets=4,
        stats_columns=["warc_ts", "score"],
        **kw,
    )


def test_count_and_bounds_pure_metadata(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t = t.append(_batch(spark, 1, 40, 0), batch_id="b1")
    t = t.append(_batch(spark, 2, 40, 100), batch_id="b2")
    n, d = t.count_rows(detail=True)
    assert n == t.read().count() == 80
    assert d["scanned_files"] == 0 and d["scanned_delta_buckets"] == 0
    assert d["metadata_files"] == len(t.manifest["files"])
    (lo, hi), bd = t.column_bounds("score", detail=True)
    assert (lo, hi) == (0.0, 139.0)
    assert bd["scanned_files"] == 0
    (tmn, tmx), bd2 = t.column_bounds("warc_ts", detail=True)
    assert bd2["scanned_files"] == 0
    assert tmn == datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    assert tmx == datetime.datetime(2024, 2, 25, tzinfo=datetime.timezone.utc)


def test_tombstoned_files_fall_back_and_stay_exact(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t = t.append(_batch(spark, 1, 40, 0), batch_id="b1")
    # kill the extreme-score rows: live bounds must SHRINK — a pure
    # file-bounds answer would still report the dead max
    t = t.delete_where(F.col("score") >= 38.0, batch_id="del-top")
    expect = t.read().count()
    n, d = t.count_rows(detail=True)
    assert n == expect == 38
    assert d["scanned_files"] > 0  # the rewritten mixed files
    assert d["metadata_rows"] + d["scanned_files"] >= 0
    lo, hi = t.column_bounds("score")
    assert (lo, hi) == (0.0, 37.0)


def test_statless_table_falls_back_to_full_scan(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), TableSchema.from_struct(ST), key="url", num_buckets=4
    )
    t = t.append(_batch(spark, 1, 25, 0), batch_id="b1")
    n, d = t.count_rows(detail=True)
    assert n == 25 and d["metadata_files"] == 0 and d["scanned_files"] > 0
    assert t.column_bounds("score") == (0.0, 24.0)


def test_mor_delta_buckets_resolve_exactly(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), merge_on_read=True)
    t = t.append(_batch(spark, 1, 40, 0), batch_id="b1")
    up = spark.createDataFrame(
        [
            ("https://x/1", datetime.datetime(2024, 6, 1), "upd", 1000.0, False),
            ("https://x/999", datetime.datetime(2024, 6, 1), "new", -5.0, False),
        ],
        "url string, warc_ts timestamp, text string, score double, _deleted boolean",
    )
    touched = sorted(
        r["b"] for r in up.select(t.bucket_expr("url").alias("b")).distinct().collect()
    )
    t = t.write_deltas(up, touched, "b2")
    t = t.delete_keys(
        spark.createDataFrame([("https://x/2",)], "url string"),
        datetime.datetime(2024, 6, 1),
        "b3",
    )
    assert any(f.get("delta") for f in t.manifest["files"])
    n, d = t.count_rows(detail=True)
    assert n == t.read().count() == 40  # +1 insert, -1 delete
    assert d["scanned_delta_buckets"] > 0
    # untouched buckets still answer from metadata
    assert d["metadata_files"] > 0
    assert t.column_bounds("score") == (-5.0, 1000.0)


def test_predicate_count_pure_metadata_when_files_decide(spark, tmp_path):
    """Per-file ranges don't straddle the predicate: January files are
    pruned (no-match), February files are must-match — the filtered
    count is a pure manifest walk."""
    t = _mk(spark, str(tmp_path / "t"))
    t = t.append(_batch(spark, 1, 40, 0), batch_id="jan")
    t = t.append(_batch(spark, 2, 40, 100), batch_id="feb")
    n, d = t.count_rows(
        where=[("warc_ts", ">=", datetime.datetime(2024, 2, 1))], detail=True
    )
    assert n == 40
    assert d["scanned_files"] == 0 and d["metadata_files"] > 0
    # and the inverse predicate too
    n2, d2 = t.count_rows(
        where=[("warc_ts", "<", datetime.datetime(2024, 2, 1))], detail=True
    )
    assert n2 == 40 and d2["scanned_files"] == 0


def test_predicate_count_scans_only_straddling_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t = t.append(_batch(spark, 1, 40, 0), batch_id="jan")
    t = t.append(_batch(spark, 2, 40, 100), batch_id="feb")
    # score spans 0..39 in jan files and 100..139 in feb files; a cut
    # at 120 prunes jan, straddles feb
    n, d = t.count_rows(where=[("score", ">=", 120.0)], detail=True)
    expect = t.read().filter(F.col("score") >= 120.0).count()
    assert n == expect == 20
    assert 0 < d["scanned_files"] < len(t.manifest["files"])


def test_predicate_count_exact_with_tombstones_and_mor(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), merge_on_read=True)
    t = t.append(_batch(spark, 1, 40, 0), batch_id="b1")
    t = t.delete_keys(
        spark.createDataFrame([("https://x/3",), ("https://x/7",)], "url string"),
        datetime.datetime(2024, 6, 1),
        "del",
    )
    for cut in (0.0, 10.0, 35.0, 200.0):
        got = t.count_rows(where=[("score", ">=", cut)])
        expect = t.read().filter(F.col("score") >= cut).count()
        assert got == expect, (cut, got, expect)


def test_predicate_bounds_pure_metadata_when_files_decide(spark, tmp_path):
    """Filtered min/max is a pure manifest walk when every surviving
    file must-matches the predicate (and is pruned otherwise)."""
    t = _mk(spark, str(tmp_path / "t"))
    t = t.append(_batch(spark, 1, 40, 0), batch_id="jan")
    t = t.append(_batch(spark, 2, 40, 100), batch_id="feb")
    (lo, hi), d = t.column_bounds(
        "score", where=[("warc_ts", ">=", datetime.datetime(2024, 2, 1))], detail=True
    )
    assert (lo, hi) == (100.0, 139.0)
    assert d["scanned_files"] == 0 and d["metadata_files"] > 0


def test_predicate_bounds_scan_straddlers_only_and_stay_exact(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t = t.append(_batch(spark, 1, 40, 0), batch_id="jan")
    t = t.append(_batch(spark, 2, 40, 100), batch_id="feb")
    # jan pruned (no-match), feb files straddle the 120 cut: the min
    # must come from a real scan, NOT the feb file bounds (min 100 is
    # outside the predicate)
    (lo, hi), d = t.column_bounds("score", where=[("score", ">=", 120.0)], detail=True)
    assert (lo, hi) == (120.0, 139.0)
    assert 0 < d["scanned_files"] < len(t.manifest["files"])
    # no matching rows at all -> (None, None)
    assert t.column_bounds("score", where=[("score", ">", 999.0)]) == (None, None)


def test_predicate_bounds_exact_with_tombstones_and_mor(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), merge_on_read=True)
    t = t.append(_batch(spark, 1, 40, 0), batch_id="b1")
    up = spark.createDataFrame(
        [("https://x/5", datetime.datetime(2024, 3, 1), "upd", 500.0, False)],
        "url string, warc_ts timestamp, text string, score double, _deleted boolean",
    )
    touched = sorted(
        r["b"] for r in up.select(t.bucket_expr("url").alias("b")).distinct().collect()
    )
    t = t.write_deltas(up, touched, "b2")
    t = t.delete_keys(
        spark.createDataFrame([("https://x/39",)], "url string"),
        datetime.datetime(2024, 6, 1),
        "del",
    )
    for cut in (0.0, 10.0, 35.0, 600.0):
        got = t.column_bounds("score", where=[("score", ">=", cut)])
        [r] = (
            t.read()
            .filter(F.col("score") >= cut)
            .agg(F.min("score").alias("mn"), F.max("score").alias("mx"))
            .collect()
        )
        assert got == (r["mn"], r["mx"]), (cut, got)


def test_empty_table_bounds(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    assert t.count_rows() == 0
    assert t.column_bounds("score") == (None, None)


def test_unknown_column_raises(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="not in schema"):
        t.column_bounds("nope")
