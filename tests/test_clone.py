"""Deep clone (snapshot export): independence, ledger carry, MOR."""

import pytest

from pyspark.sql import functions as F

from dbp_etl_spark.cdc import CDCRunner
from dbp_etl_spark.lake import LakeTable

from test_merge import PAGES, mk_table


def _state(t):
    return sorted(
        (r["url"], r["warc_ts"].timestamp(), bytes(r["html"]))
        for r in t.read().collect()
    )


def _mk_changes(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("op", T.StringType()),
            T.StructField("batch_id", T.LongType()),
        ]
    )
    from datetime import datetime, timezone

    return spark.createDataFrame(
        [
            (u, datetime.fromtimestamp(ts, tz=timezone.utc), h, op, b)
            for (u, ts, h, op, b) in rows
        ],
        schema,
    )


ROWS = [
    ("u1", 100.0, b"<p>one</p>", "update", 0),
    ("u2", 100.0, b"<p>two</p>", "update", 0),
    ("u1", 200.0, b"<p>one-v2</p>", "update", 1),
    ("u3", 200.0, b"<p>three</p>", "update", 1),
]


def test_clone_state_ledger_and_independence(spark, tmp_path):
    src = mk_table(spark, tmp_path / "src")
    CDCRunner(src).run(_mk_changes(spark, ROWS))
    src = src.refresh()

    clone = src.clone_to(str(tmp_path / "dst"))
    assert _state(clone) == _state(src)
    assert clone.snapshot_id == 0

    # ledger carried: replaying the same tail against the clone no-ops
    rep = CDCRunner(clone).run(_mk_changes(spark, ROWS))
    assert rep.n_skipped == 2
    assert _state(clone) == _state(src)

    # independence both ways
    more = [("u4", 300.0, b"<p>four</p>", "update", 7)]
    CDCRunner(src.refresh()).run(_mk_changes(spark, more))
    assert ("u4" in {s[0] for s in _state(src.refresh())}) and (
        "u4" not in {s[0] for s in _state(clone.refresh())}
    )
    CDCRunner(clone.refresh()).run(
        _mk_changes(spark, [("u5", 300.0, b"<p>five</p>", "update", 8)])
    )
    assert "u5" not in {s[0] for s in _state(src.refresh())}


def test_clone_at_older_snapshot(spark, tmp_path):
    src = mk_table(spark, tmp_path / "src")
    runner = CDCRunner(src)
    runner.run(_mk_changes(spark, [r for r in ROWS if r[4] == 0]))
    src = src.refresh()
    snap_after_b0 = src.snapshot_id
    runner.run(_mk_changes(spark, [r for r in ROWS if r[4] == 1]))
    src = src.refresh()

    clone = src.clone_to(str(tmp_path / "dst"), snapshot_id=snap_after_b0)
    want = sorted(
        (r["url"], r["warc_ts"].timestamp(), bytes(r["html"]))
        for r in src.read(snapshot_id=snap_after_b0).collect()
    )
    assert _state(clone) == want
    # only batch 0 is in the clone's ledger
    assert clone.is_committed(0) and not clone.is_committed(1)


def test_clone_refusals(spark, tmp_path):
    src = mk_table(spark, tmp_path / "src")
    CDCRunner(src).run(_mk_changes(spark, ROWS))
    src = src.refresh()
    src.clone_to(str(tmp_path / "dst"))
    with pytest.raises(ValueError, match="already holds a table"):
        src.clone_to(str(tmp_path / "dst"))


def test_clone_mor_table_with_deltas(spark, tmp_path):
    from dbp_etl_spark.lake import TableSchema

    src = LakeTable.create(
        spark,
        str(tmp_path / "mor"),
        TableSchema.from_struct(PAGES),
        key="url",
        num_buckets=8,
        merge_on_read=True,
    )
    runner = CDCRunner(src)
    runner.run(_mk_changes(spark, [r for r in ROWS if r[4] == 0]))
    runner.run(_mk_changes(spark, [r for r in ROWS if r[4] == 1]))
    src = src.refresh()
    assert any(f.get("delta") for f in src.manifest["files"])  # real deltas

    clone = src.clone_to(str(tmp_path / "mor_clone"))
    assert _state(clone) == _state(src)
    # clone still resolves deltas and can compact independently
    clone = clone.compact(batch_id="clone-compact-0")
    assert _state(clone) == _state(src)
