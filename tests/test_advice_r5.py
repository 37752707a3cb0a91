"""Regression tests for the round-4 ADVICE findings fixed in round 5:

1. clone_to must sanitize snapshot-id-relative manifest state
   (min_retained_snapshot, tags) so vacuum on a clone of an
   expire_snapshots'd source cannot delete live files.
2. repetition_exprs must not crash on one-token / empty documents.
"""

from pyspark.sql import functions as F

from dbp_etl_spark.cdc import CDCRunner
from dbp_etl_spark.functions.quality import repetition_exprs
from dbp_etl_spark.lake import LakeTable

from test_clone import ROWS, _mk_changes, _state
from test_merge import mk_table


def test_clone_of_expired_source_survives_vacuum(spark, tmp_path):
    src = mk_table(spark, tmp_path / "src")
    # several commits so expire_snapshots has history to drop
    for b in (0, 1):
        CDCRunner(src.refresh()).run(
            _mk_changes(spark, [r for r in ROWS if r[4] == b])
        )
    src = src.refresh()
    src = src.tag_snapshot("release")  # tag at head: survives expiry
    src.expire_snapshots(keep_last=1)
    src = src.refresh()
    assert src.min_retained_snapshot > 0

    clone = src.clone_to(str(tmp_path / "dst"))
    # snapshot-relative state must NOT carry into the clone's v0
    assert clone.min_retained_snapshot == 0
    assert clone.tags == {}
    assert not any(k.startswith("wap_") for k in clone.manifest)

    before = _state(clone)
    # pre-fix this deleted every live file (empty retained-snapshot scan)
    clone.remove_orphan_files(grace_sec=0.0)
    assert _state(clone.refresh()) == before == _state(src)


def test_repetition_exprs_short_docs(spark):
    df = spark.createDataFrame(
        [("", ), ("solo", ), ("a b a b a", )], ["txt"]
    ).select(
        "txt",
        *[
            v.alias(k)
            for k, v in repetition_exprs(F.split("txt", " ")).items()
        ],
    )
    rows = {r["txt"]: r for r in df.collect()}  # must not throw
    # split("", " ") -> [""]: one token, no bigrams
    assert rows[""]["dup_bigram_frac"] == 0.0
    assert rows["solo"]["dup_bigram_frac"] == 0.0
    assert rows["solo"]["top_token_frac"] == 1.0
    # unchanged on normal docs
    assert rows["a b a b a"]["dup_bigram_frac"] == 0.5
    assert rows["a b a b a"]["top_token_frac"] == 0.6
