"""Manifest-level file statistics and metadata file skipping.

The scale claim under test: ``read(where=...)`` must plan from the
manifest alone (drop files whose bounds prove emptiness, fold a merge-
key equality into bucket pruning) while NEVER changing results — every
case asserts equality against the unpruned ``read().filter(...)``.
Reference precedent: prefix/filename filtering before download,
/root/reference/load/InputFileset.py:86-118.
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.lake import LakeTable, TableSchema
from dbp_etl_spark.lake.stats import file_may_match

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


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stats_lake"))
    t = LakeTable.create(
        spark,
        f"{root}/t",
        TableSchema.from_struct(ST),
        key="url",
        num_buckets=4,
        stats_columns=["warc_ts", "score"],
    )
    t = t.append(_batch(spark, 1, 40, 0), batch_id="b1")
    t = t.append(_batch(spark, 2, 40, 100), batch_id="b2")
    t = t.append(_batch(spark, 3, 40, 200), batch_id="b3")
    return t


def test_entries_carry_bounds(table):
    for e in table.manifest["files"]:
        stats = e["stats"]
        assert stats["rows"] > 0
        ts = stats["cols"]["2"]  # warc_ts col id
        sc = stats["cols"]["4"]  # score col id
        assert ts["t"] == "ts" and ts["min"] <= ts["max"] and ts["nulls"] == 0
        assert sc["t"] == "num" and sc["min"] <= sc["max"]


def test_range_scan_prunes_and_matches(table):
    lo = datetime.datetime(2024, 3, 1)
    cand = table.candidate_files(where=[("warc_ts", ">=", lo)])
    assert 0 < len(cand) < len(table.manifest["files"])
    full = table.read().filter(F.col("warc_ts") >= F.lit(lo)).orderBy("url").collect()
    pruned = table.read(where=[("warc_ts", ">=", lo)]).orderBy("url").collect()
    assert pruned == full and len(pruned) == 40


def test_string_timestamp_predicate(table):
    assert table.read(where=[("warc_ts", ">=", "2024-03-01 00:00:00")]).count() == 40


def test_non_utc_session_predicate_stays_correct(table):
    """Naive datetime predicates localize with the SESSION timezone —
    in a non-UTC session the manifest-bound compare must shift with
    F.lit's interpretation or pruning would silently drop rows."""
    spark = table.spark
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        lo = datetime.datetime(2024, 3, 1)
        full = table.read().filter(F.col("warc_ts") >= F.lit(lo)).count()
        pruned = table.read(where=[("warc_ts", ">=", lo)]).count()
        assert pruned == full
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_key_equality_folds_into_bucket_pruning(table):
    cand = table.candidate_files(where=[("url", "=", "https://x/205")])
    buckets = {c["bucket"] for c in cand}
    assert len(buckets) == 1
    rows = table.read(where=[("url", "=", "https://x/205")]).collect()
    assert len(rows) == 1 and rows[0].url == "https://x/205"


def test_numeric_and_in_predicates(table):
    full = (
        table.read()
        .filter(F.col("score").isin([5.0, 205.0]) & (F.col("score") > 100.0))
        .orderBy("url")
        .collect()
    )
    got = (
        table.read(where=[("score", "in", [5.0, 205.0]), ("score", ">", 100.0)])
        .orderBy("url")
        .collect()
    )
    assert got == full and len(got) == 1
    # an impossible range prunes everything from metadata alone
    assert table.candidate_files(where=[("score", ">", 10_000.0)]) == []


def test_rename_keeps_pruning_by_column_id(table):
    t = table.rename_column("score", "quality")
    try:
        cand = t.candidate_files(where=[("quality", ">=", 200.0)])
        assert 0 < len(cand) < len(t.manifest["files"])
        got = sorted(
            r.url
            for r in t.read(where=[("quality", ">=", 200.0), ("quality", "<", 203.0)]).collect()
        )
        assert got == ["https://x/200", "https://x/201", "https://x/202"]
    finally:
        t.rename_column("quality", "score")


def test_late_enable_is_conservative(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), TableSchema.from_struct(ST), key="url", num_buckets=4
    )
    t = t.append(_batch(spark, 1, 20, 0), batch_id="b1")
    assert "stats" not in t.manifest["files"][0]
    t = t.set_stats_columns(["warc_ts"])
    t = t.append(_batch(spark, 6, 20, 500), batch_id="b2")
    # predicate excludes the June batch; stat-less January files survive
    cand = t.candidate_files(where=[("warc_ts", ">=", datetime.datetime(2024, 7, 1))])
    assert {c["bucket"] for c in cand} and all("stats" not in c for c in cand)
    assert t.read(where=[("warc_ts", ">=", datetime.datetime(2024, 6, 1))]).count() == 20


def test_all_null_file_pruned_for_comparisons(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "t3"),
        TableSchema.from_struct(ST),
        key="url",
        num_buckets=1,
        stats_columns=["score"],
    )
    rows = [(f"u{i}", datetime.datetime(2024, 1, 1), "x", None) for i in range(5)]
    t = t.append(spark.createDataFrame(rows, ST), batch_id="nulls")
    assert t.candidate_files(where=[("score", ">", 0.0)]) == []
    assert t.read(where=[("score", ">", 0.0)]).count() == 0
    assert t.read().count() == 5  # unfiltered read unaffected


def test_merge_and_compact_preserve_stats(table, tmp_path):
    t = LakeTable.create(
        table.spark,
        str(tmp_path / "t4"),
        TableSchema.from_struct(ST),
        key="url",
        num_buckets=2,
        stats_columns=["warc_ts"],
    )
    t = t.append(_batch(t.spark, 1, 30, 0), batch_id="b1")
    t = t.append(_batch(t.spark, 2, 30, 50), batch_id="b2")
    t = t.compact(batch_id="c1", sort_by=["warc_ts"])
    assert all("stats" in e and "2" in e["stats"]["cols"] for e in t.manifest["files"])
    assert t.read(where=[("warc_ts", "<", datetime.datetime(2024, 2, 1))]).count() == 30


def test_file_may_match_is_conservative_without_stats():
    assert file_may_match({}, {2: [("=", 5)]})
    assert file_may_match({"stats": {"rows": 3, "cols": {}}}, {2: [("=", 5)]})
    # type-mismatched predicate value cannot prune
    entry = {"stats": {"rows": 3, "cols": {"2": {"t": "num", "min": 1, "max": 2, "nulls": 0}}}}
    assert file_may_match(entry, {2: [("=", "not-a-number")]})
    assert not file_may_match(entry, {2: [("=", 99)]})


def test_stats_columns_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="not in schema"):
        LakeTable.create(
            spark,
            str(tmp_path / "bad1"),
            TableSchema.from_struct(ST),
            key="url",
            stats_columns=["nope"],
        )
    schema = TableSchema.from_struct(
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("html", T.BinaryType()),
            ]
        )
    )
    with pytest.raises(ValueError, match="unsupported"):
        LakeTable.create(
            spark, str(tmp_path / "bad2"), schema, key="url", stats_columns=["html"]
        )
