"""Z-order compaction: multi-dimensional file skipping vs lexicographic
sort, content invariance, and key math edge cases."""

import datetime
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.lake import LakeTable, TableSchema
from dbp_etl_spark.operators.zorder import zorder_bounds, zorder_key

ST = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ]
)


@pytest.fixture(scope="module")
def uniform_df(spark):
    rng = random.Random(3)
    rows = [
        (f"u{i}", datetime.datetime(2024, 1, 1), rng.randrange(0, 1000), rng.randrange(0, 1000))
        for i in range(20000)
    ]
    return spark.createDataFrame(rows, ST)


def _build(spark, tmp_path, df, name, **compact_kw):
    t = LakeTable.create(
        spark,
        str(tmp_path / name),
        TableSchema.from_struct(ST),
        key="url",
        num_buckets=4,
        stats_columns=["x", "y"],
    )
    t = t.append(df, batch_id="b1")
    return t.compact("c1", files_per_bucket=8, **compact_kw)


def test_zorder_prunes_every_interleaved_dimension(spark, tmp_path, uniform_df):
    ts = _build(spark, tmp_path, uniform_df, "sorted", sort_by=["x"])
    tz = _build(spark, tmp_path, uniform_df, "zordered", zorder_by=["x", "y"])
    wy = [("y", ">=", 100), ("y", "<", 200)]
    n_sort, n_z = len(ts.manifest["files"]), len(tz.manifest["files"])
    # lexicographic sort leaves y unprunable; z-order does not
    assert len(ts.candidate_files(where=wy)) == n_sort
    assert len(tz.candidate_files(where=wy)) < n_z
    # x stays prunable under z-order too
    wx = [("x", ">=", 100), ("x", "<", 200)]
    assert len(tz.candidate_files(where=wx)) < n_z
    # pruned reads are exact, and content is invariant across layouts
    exact = uniform_df.filter((F.col("y") >= 100) & (F.col("y") < 200)).count()
    assert tz.read(where=wy).count() == exact
    assert ts.state_hash() == tz.state_hash()


def test_files_per_bucket_splits(spark, tmp_path, uniform_df):
    t = _build(spark, tmp_path, uniform_df, "split", zorder_by=["x", "y"])
    by_bucket: dict[int, int] = {}
    for f in t.manifest["files"]:
        by_bucket[f["bucket"]] = by_bucket.get(f["bucket"], 0) + 1
    assert all(n > 1 for n in by_bucket.values())


def test_zorder_key_locality(spark):
    """Points close in both dimensions get closer keys than points far
    in one dimension — the property that makes range files tight."""
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (1023, 0)], "x long, y long"
    )
    bounds = {"x": (0.0, 1023.0), "y": (0.0, 1023.0)}
    rows = df.select("x", "y", zorder_key(df, ["x", "y"], bounds).alias("z")).collect()
    z = {(r.x, r.y): r.z for r in rows}
    assert abs(z[(1, 1)] - z[(0, 0)]) < abs(z[(1023, 0)] - z[(0, 0)])


def test_zorder_nulls_and_constant_column(spark):
    df = spark.createDataFrame(
        [(None, 5), (3, 5), (9, 5)], "x int, y int"
    )
    bounds = zorder_bounds(df, ["x", "y"])
    assert bounds["y"] == (5.0, 5.0)
    vals = [r.z for r in df.select(zorder_key(df, ["x", "y"], bounds).alias("z")).collect()]
    assert all(v is not None and v >= 0 for v in vals)


def test_zorder_validation(spark, uniform_df):
    with pytest.raises(ValueError, match="2-6"):
        zorder_key(uniform_df, ["x"], {"x": (0, 1)})
    with pytest.raises(ValueError, match="unsupported"):
        zorder_bounds(uniform_df, ["url"])


def test_sort_and_zorder_mutually_exclusive(spark, tmp_path, uniform_df):
    t = LakeTable.create(
        spark,
        str(tmp_path / "excl"),
        TableSchema.from_struct(ST),
        key="url",
        num_buckets=2,
    )
    t = t.append(uniform_df.limit(100), batch_id="b1")
    with pytest.raises(ValueError, match="not both"):
        t.compact("c1", sort_by=["x"], zorder_by=["x", "y"])
