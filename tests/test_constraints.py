"""Table CHECK constraints (Delta-constraint analog).

Enforcement contract: a declared constraint is checked on EVERY write
path by metrics observed on the write job itself (no extra scan); a
violating batch aborts BEFORE the manifest commit, so bad rows are
never visible and the failed attempt's files are orphans. Declaration
validates existing data; tombstone rows are exempt (deletes null their
payload by design).
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.cdc import CDCRunner, generate_changes, merge_batch
from dbp_etl_spark.lake import ConstraintViolation, LakeTable, TableSchema

ST = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def mk(spark, tmp_path, name="t", **kw):
    return LakeTable.create(
        spark, str(tmp_path / name), TableSchema.from_struct(ST), key="url", num_buckets=4, **kw
    )


def rows(spark, vals):
    return spark.createDataFrame(
        [(u, datetime.datetime(2024, 1, 1 + i % 20), s) for i, (u, s) in enumerate(vals)],
        ST,
    )


def test_append_rejects_violations_atomically(spark, tmp_path):
    t = mk(spark, tmp_path, constraints={"score-nonneg": "score >= 0"})
    t = t.append(rows(spark, [("a", 1.0), ("b", 2.0)]), batch_id="ok")
    snap = t.snapshot_id
    with pytest.raises(ConstraintViolation, match="score-nonneg=1 rows"):
        t.append(rows(spark, [("c", 3.0), ("d", -1.0)]), batch_id="bad")
    t = t.refresh()
    assert t.snapshot_id == snap  # nothing committed
    assert not t.is_committed("bad")
    assert t.read().count() == 2
    # the aborted attempt's files are orphans and vacuum away
    t.remove_orphan_files(grace_sec=0.0)
    assert t.read().count() == 2


def test_null_fails_check_delta_semantics(spark, tmp_path):
    t = mk(spark, tmp_path, constraints={"score-present": "score IS NOT NULL"})
    with pytest.raises(ConstraintViolation, match="score-present"):
        t.append(rows(spark, [("a", None)]), batch_id="b")
    # and a plain range check also fails on NULL (must be TRUE to pass)
    t2 = mk(spark, tmp_path, "t2", constraints={"rng": "score >= 0"})
    with pytest.raises(ConstraintViolation, match="rng"):
        t2.append(rows(spark, [("a", None)]), batch_id="b")
    # an explicitly nullable check passes
    t3 = mk(spark, tmp_path, "t3", constraints={"rng": "score IS NULL OR score >= 0"})
    t3 = t3.append(rows(spark, [("a", None), ("b", 1.0)]), batch_id="b")
    assert t3.read().count() == 2


def test_add_constraint_validates_existing_then_enforces(spark, tmp_path):
    t = mk(spark, tmp_path)
    t = t.append(rows(spark, [("a", 5.0), ("b", -2.0)]), batch_id="b1")
    with pytest.raises(ConstraintViolation, match="1 existing live rows"):
        t.add_constraint("nonneg", "score >= 0")
    # fix the data, then the constraint lands and enforces
    t = t.delete_where(F.col("score") < 0, batch_id="fix")
    t = t.add_constraint("nonneg", "score >= 0")
    assert t.constraints == {"nonneg": "score >= 0"}
    with pytest.raises(ConstraintViolation):
        t.append(rows(spark, [("c", -9.0)]), batch_id="b2")
    # tombstones are exempt: deleting (payload nulled) still works
    t = t.refresh().delete_where(F.col("url") == "a", batch_id="del-a")
    assert t.read().count() == 0
    t = t.drop_constraint("nonneg")
    t = t.append(rows(spark, [("d", -1.0)]), batch_id="b3")
    assert t.read().count() == 1


def test_constraint_declaration_rejects_bad_exprs(spark, tmp_path):
    t = mk(spark, tmp_path)
    with pytest.raises(ValueError, match="invalid"):
        t.add_constraint("x", "no_such_col > 0")
    with pytest.raises(ValueError, match="boolean"):
        t.add_constraint("x", "score + 1")
    with pytest.raises(ValueError, match="must be"):
        t.add_constraint("bad name!", "score >= 0")
    with pytest.raises(ValueError, match="different"):
        t2 = t.add_constraint("a", "score >= 0")
        t2.add_constraint("a", "score >= 1")


def test_merge_path_enforces_constraints(spark, tmp_path):
    """The CDC MERGE rides the same write choke point: a batch whose
    extracted state violates a constraint aborts with main untouched,
    and the batch id stays uncommitted (resume after fixing)."""
    pages = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / "pages"),
        TableSchema.from_struct(pages),
        key="url",
        num_buckets=4,
        constraints={"text-extracted": "text IS NOT NULL"},
    )
    ev = generate_changes(spark, 400, 20, n_batches=1, seed=3)
    CDCRunner(t).run(ev)
    t = t.refresh()
    assert t.read().count() > 0  # extraction satisfies the constraint
    # an update whose transform yields NULL text violates -> abort
    bad = spark.createDataFrame(
        [("u-bad", datetime.datetime(2024, 2, 1), b"<p>x</p>", "insert")],
        "url string, warc_ts timestamp, html binary, op string",
    )
    snap = t.snapshot_id
    with pytest.raises(ConstraintViolation, match="text-extracted"):
        merge_batch(t, bad, "bad-batch", transform=lambda df: df.withColumn(
            "text", F.lit(None).cast("string")
        ).withColumn("lang", F.lit(None).cast("string")))
    t = t.refresh()
    assert t.snapshot_id == snap and not t.is_committed("bad-batch")


def test_mor_delta_writes_enforce_and_exempt_tombstones(spark, tmp_path):
    t = mk(spark, tmp_path, merge_on_read=True, constraints={"nonneg": "score >= 0"})
    t = t.append(rows(spark, [("a", 1.0), ("b", 2.0)]), batch_id="b1")
    up = spark.createDataFrame(
        [("a", datetime.datetime(2024, 3, 1), -5.0, False)],
        "url string, warc_ts timestamp, score double, _deleted boolean",
    )
    touched = sorted(
        r["b"] for r in up.select(t.bucket_expr("url").alias("b")).distinct().collect()
    )
    with pytest.raises(ConstraintViolation):
        t.write_deltas(up, touched, "bad")
    # equality-delete tombstones (nulled payload) pass untouched
    t = t.refresh().delete_keys(
        spark.createDataFrame([("b",)], "url string"),
        datetime.datetime(2024, 3, 1),
        "del-b",
    )
    assert {r["url"] for r in t.read().collect()} == {"a"}


def test_constraints_survive_compaction_and_rollback(spark, tmp_path):
    t = mk(spark, tmp_path, constraints={"nonneg": "score >= 0"})
    t = t.append(rows(spark, [("a", 1.0)]), batch_id="b1")
    pre = t.snapshot_id
    t = t.drop_constraint("nonneg")
    t = t.append(rows(spark, [("b", -1.0)]), batch_id="b2")
    # rollback restores the constraint set WITH the state it governed
    t = t.rollback_to(pre)
    assert t.constraints == {"nonneg": "score >= 0"}
    with pytest.raises(ConstraintViolation):
        t.append(rows(spark, [("c", -2.0)]), batch_id="b3")
    t = t.refresh().compact("fold")  # rewrite of valid rows passes
    assert t.read().count() == 1
