"""Round-4 advice regressions: lock fencing at point of use, CDF
column-id alignment across drop/re-add and rename, JPEG truncation
errors, add_column id-reuse guard."""

import time

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.lake import LakeTable, TableSchema
from dbp_etl_spark.lake.lock import FileLockService
from dbp_etl_spark.lake.table import CommitConflict

from test_lake import PAGES, mk_rows


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "pages"), TableSchema.from_struct(PAGES), key="url", num_buckets=8
    )


# ---------------------------------------------------------------- lock fencing


def test_lock_validate_tracks_takeover(tmp_path):
    """A holder stalled past its TTL sees validate()==False once a
    successor generation exists — the fencing signal."""
    svc = FileLockService(str(tmp_path / "locks"))
    t1 = svc.acquire("commit", ttl_sec=0.2, timeout_sec=5.0)
    assert svc.validate("commit", t1) is True
    time.sleep(0.35)  # lease expires
    t2 = svc.acquire("commit", ttl_sec=30.0, timeout_sec=5.0)  # takeover
    assert svc.validate("commit", t1) is False  # superseded: must not commit
    assert svc.validate("commit", t2) is True
    svc.release("commit", t2)


def test_lock_validate_expired_without_successor(tmp_path):
    """Even with no successor yet, an expired lease fails validation —
    a successor could appear between the check and the manifest create,
    so an expired holder must not proceed."""
    svc = FileLockService(str(tmp_path / "locks"))
    t1 = svc.acquire("commit", ttl_sec=0.15, timeout_sec=5.0)
    time.sleep(0.3)
    assert svc.validate("commit", t1) is False


class _StaleLock:
    """Lock whose lease is always already lost at the point of use."""

    def acquire(self, name, ttl_sec=60.0, timeout_sec=30.0):
        return "1:deadbeef"

    def release(self, name, token):
        pass

    def validate(self, name, token):
        return False


def test_commit_fenced_on_stale_lease(spark, table):
    """_commit aborts with CommitConflict (no manifest created) when the
    lease fails re-validation immediately before the manifest create."""
    table.lock = _StaleLock()
    snap = table.snapshot_id
    with pytest.raises(CommitConflict, match="lease"):
        table.append(mk_rows(spark, 4), batch_id="b0")
    table.lock = None
    assert table.refresh().snapshot_id == snap  # nothing published


def test_commit_succeeds_under_live_lease(spark, table, tmp_path):
    table.lock = FileLockService(str(tmp_path / "locks"))
    table.append(mk_rows(spark, 4), batch_id="b0")
    assert table.read().count() == 4


# ------------------------------------------------- CDF column-id alignment


def test_read_changes_rename_keeps_preimage(spark, table):
    """Rename inside the CDF window: old rows align by column id, so
    unchanged rows do NOT surface as spurious update_post."""
    t = table.append(mk_rows(spark, 40, tag="v1"), batch_id="b0")
    s0 = t.snapshot_id
    t = t.rename_column("text", "body")
    new_rows = (
        mk_rows(spark, 6, tag="v2")
        .withColumn("url", F.concat(F.lit("https://new.example/p"), F.monotonically_increasing_id()))
        .withColumnRenamed("text", "body")
    )
    t = t.append(new_rows, batch_id="b1")
    feed = t.read_changes(s0).collect()
    by_type: dict = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert len(by_type.get("insert", [])) == 6
    # the 40 pre-existing rows are unchanged (same ids): no updates/deletes
    assert "update_post" not in by_type
    assert "delete" not in by_type
    # inserts carry the renamed column's values
    assert all(r["body"] is not None for r in by_type["insert"])


def test_read_changes_drop_readd_null_preimage(spark, table):
    """Drop + re-add of a column inside the window: the re-added column
    has a fresh id, so the dropped column's bytes must NOT become its
    pre-image — old rows show no change (NULL pre, NULL post)."""
    t = table.append(mk_rows(spark, 40, tag="v1"), batch_id="b0")  # lang='en'
    s0 = t.snapshot_id
    t = t.drop_column("lang")
    t = t.add_column("lang", "string")
    new_rows = mk_rows(spark, 5, tag="v2").withColumn(
        "url", F.concat(F.lit("https://new.example/q"), F.monotonically_increasing_id())
    ).withColumn("lang", F.lit("de"))
    t = t.append(new_rows, batch_id="b1")
    feed = t.read_changes(s0).collect()
    by_type: dict = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append(r)
    # by-NAME alignment would read old lang='en' vs post NULL and emit a
    # spurious update_post per old row; by-id alignment emits none
    assert "update_post" not in by_type
    assert len(by_type.get("insert", [])) == 5
    assert all(r["lang"] == "de" for r in by_type["insert"])


# ------------------------------------------------------ JPEG truncation


def test_jpeg_truncated_entropy_raises():
    from dbp_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (24, 24, 3), np.uint8)
    data = encode_jpeg(img, quant=1)
    # chop well into the entropy segment (keep all headers)
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(data[: len(data) - len(data) // 4])


def test_jpeg_lone_ff_and_bad_seglen_raise():
    from dbp_etl_spark.operators.jpeg import decode_jpeg

    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b"\xff\xd8\xff")  # lone 0xFF at end
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b"\xff\xd8\xff\xe0\xff\xff")  # seglen past end


# ------------------------------------------------ schema id-reuse guard


def test_add_column_rejects_reused_id():
    schema = TableSchema.from_struct(
        T.StructType([T.StructField("a", T.StringType()), T.StructField("b", T.LongType())])
    )
    with pytest.raises(ValueError, match="col_id"):
        schema.add_column("c", "string", col_id=0)
    with pytest.raises(ValueError, match="col_id"):
        schema.add_column("c", "string", col_id=2)  # b's id
    assert schema.add_column("c", "string", col_id=3).max_id() == 3
