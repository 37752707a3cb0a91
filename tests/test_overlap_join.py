"""Binned interval-overlap join: parity with the naive cartesian form,
exactly-once pair emission, and the equi-join plan class."""

import datetime
import random

import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.operators.windows import overlap_join_binned

BASE = datetime.datetime(2024, 1, 1)


def _intervals(rng, n, pref, maxlen):
    rows = []
    for i in range(n):
        s = BASE + datetime.timedelta(seconds=rng.randrange(0, 200_000))
        e = s + datetime.timedelta(seconds=rng.randrange(0, maxlen))  # includes empty
        rows.append((f"{pref}{i}", s, e))
    return rows


@pytest.fixture(scope="module")
def sides(spark):
    rng = random.Random(7)
    left_rows = _intervals(rng, 300, "l", 7000)
    right_rows = _intervals(rng, 120, "r", 4000)
    left = spark.createDataFrame(left_rows, "lid string, ls timestamp, le timestamp")
    right = spark.createDataFrame(right_rows, "rid string, rs timestamp, re timestamp")
    naive = sorted(
        (a[0], b[0])
        for a in left_rows
        for b in right_rows
        if a[1] < b[2] and b[1] < a[2] and a[1] < a[2] and b[1] < b[2]
    )
    return left, right, naive


@pytest.mark.parametrize("bin_seconds", [60, 3600, 86400])
def test_parity_with_naive_and_exactly_once(sides, bin_seconds):
    left, right, naive = sides
    got = overlap_join_binned(left, right, ("ls", "le"), ("rs", "re"), bin_seconds)
    pairs = sorted((x.lid, x.rid) for x in got.collect())
    assert len(pairs) == len(set(pairs))  # first-overlap-bin rule: no dupes
    assert pairs == naive


def test_bin_boundary_exactness(spark):
    # intervals meeting exactly at a bin boundary: [0h,1h) vs [1h,2h)
    # must NOT match (end-exclusive); [0h,1h+1us) vs [1h,2h) must
    left = spark.createDataFrame(
        [
            ("a", BASE, BASE + datetime.timedelta(hours=1)),
            ("b", BASE, BASE + datetime.timedelta(hours=1, microseconds=1)),
        ],
        "lid string, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [("x", BASE + datetime.timedelta(hours=1), BASE + datetime.timedelta(hours=2))],
        "rid string, rs timestamp, re timestamp",
    )
    got = overlap_join_binned(left, right, ("ls", "le"), ("rs", "re"), 3600)
    assert [(r.lid, r.rid) for r in got.collect()] == [("b", "x")]


def test_no_cartesian_in_plan(sides):
    left, right, _ = sides
    plan = (
        overlap_join_binned(left, right, ("ls", "le"), ("rs", "re"), 3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_disjoint_columns_required(sides):
    left, right, _ = sides
    clash = right.withColumnRenamed("rid", "lid")
    with pytest.raises(ValueError, match="disjoint"):
        overlap_join_binned(left, clash, ("ls", "le"), ("rs", "re"), 3600)


def test_numeric_seconds_columns(spark):
    left = spark.createDataFrame([("a", 0.0, 10.0), ("b", 20.0, 21.0)], "lid string, ls double, le double")
    right = spark.createDataFrame([("x", 5.0, 25.0)], "rid string, rs double, re double")
    got = overlap_join_binned(left, right, ("ls", "le"), ("rs", "re"), 4)
    assert sorted((r.lid, r.rid) for r in got.collect()) == [("a", "x"), ("b", "x")]
