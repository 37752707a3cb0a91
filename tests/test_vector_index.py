"""Incrementally-maintained IVF vector index (operators/vector_index.py).

Contract: the index table is a transformed replica of the corpus —
after sync() it holds exactly one (key, cell, vector) row per live
corpus row with cell = nearest frozen centroid; topk() over all cells
equals brute force; optimize() tightens per-file cell bounds so probe
reads open fewer files WITHOUT changing any result.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.cdc.merge import merge_batch
from dbp_etl_spark.lake import LakeTable, TableSchema
from dbp_etl_spark.operators.similarity import assign_cells, cosine
from dbp_etl_spark.operators.vector_index import VectorIndex

DIM = 8

CORPUS = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def events(spark, n_urls, version, batch_id, delete_mod=None):
    """Deterministic change events: url u<i>, vector a hash function of
    (i, version) so updates really move vectors between cells."""
    df = spark.range(n_urls)
    vec = F.array(
        *[
            (
                F.pmod(F.xxhash64("id", F.lit(version), F.lit(d)), F.lit(1000)).cast(
                    "double"
                )
                / 500.0
                - 1.0
            ).cast("float")
            for d in range(DIM)
        ]
    )
    op = (
        F.when(F.pmod(F.col("id"), F.lit(delete_mod)) == 0, "delete")
        if delete_mod
        else F.when(F.lit(False), "x")
    ).otherwise("update")
    return df.select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.timestamp_seconds(1700000000 + F.col("id") + version * 100000).alias("warc_ts"),
        F.when(op != "delete", F.encode(F.concat(F.lit("<p>v"), F.col("id"), F.lit("</p>")), "utf-8")).alias("html"),
        F.when(op != "delete", vec).alias("embedding"),
        op.alias("op"),
        F.lit(batch_id).alias("batch_id"),
    )


def mk_corpus(spark, tmp_path, n_urls=60):
    t = LakeTable.create(
        spark,
        str(tmp_path / "corpus"),
        TableSchema.from_struct(CORPUS),
        key="url",
        num_buckets=4,
    )
    merge_batch(t, events(spark, n_urls, version=1, batch_id="b1"), "b1", transform=lambda d: d)
    return t.refresh()


def brute_topk(src, probe, k):
    return (
        src.read()
        .select("url", cosine(F.col("embedding"), F.lit(probe)).alias("score"))
        .orderBy(F.col("score").desc(), "url")
        .limit(k)
        .collect()
    )


PROBE = [0.31, -0.7, 0.11, 0.95, -0.2, 0.4, -0.55, 0.08]


def test_build_then_full_probe_equals_brute_force(spark, tmp_path):
    src = mk_corpus(spark, tmp_path)
    idx = VectorIndex.build(src, str(tmp_path / "idx"), k=4, vec_col="embedding")
    assert idx.index.read().count() == src.read().count()
    got = idx.topk(PROBE, k=5, nprobe=len(idx.centroids)).collect()
    want = brute_topk(src, PROBE, 5)
    assert [r["url"] for r in got] == [r["url"] for r in want]
    assert [round(r["score"], 9) for r in got] == [round(r["score"], 9) for r in want]
    # every row's cell is the nearest frozen centroid
    recheck = assign_cells(
        idx.index.read().select("url", "embedding"), idx.centroids, "embedding", "cell2"
    )
    joined = idx.index.read().select("url", "cell").join(recheck, "url")
    assert joined.filter(F.col("cell") != F.col("cell2")).count() == 0


def test_sync_follows_churn_updates_and_deletes(spark, tmp_path):
    src = mk_corpus(spark, tmp_path)
    idx = VectorIndex.build(src, str(tmp_path / "idx"), k=4)
    # churn: every url's vector moves (version bump), every 10th deleted
    merge_batch(
        src.refresh(),
        events(spark, 60, version=2, batch_id="b2", delete_mod=10),
        "b2",
        transform=lambda d: d,
    )
    res = idx.sync()
    assert res.mode == "cdf" and not res.skipped
    assert res.counts["delete"] > 0
    src = idx.source
    assert idx.index.read().count() == src.read().count() == 54
    assert idx.index.read().filter(F.col("url") == "u0").count() == 0  # deleted
    got = idx.topk(PROBE, k=5, nprobe=len(idx.centroids)).collect()
    want = brute_topk(src, PROBE, 5)
    assert [r["url"] for r in got] == [r["url"] for r in want]
    # replay: nothing new -> noop
    assert idx.sync().skipped


def test_optimize_prunes_probe_files_and_preserves_results(spark, tmp_path):
    src = mk_corpus(spark, tmp_path, n_urls=120)
    idx = VectorIndex.build(src, str(tmp_path / "idx"), k=6)
    # several churn rounds leave cell-straddling files behind
    for v in (2, 3):
        merge_batch(
            idx.source.refresh(),
            events(spark, 120, version=v, batch_id=f"b{v}"),
            f"b{v}",
            transform=lambda d: d,
        )
        idx.sync()
    before_files = idx.probe_plan_files(PROBE, nprobe=1)
    before_total = len(idx.index.manifest["files"])
    assert before_files == before_total  # straddlers: nothing prunable
    pre_hash = idx.index.state_hash()
    pre = idx.topk(PROBE, k=5, nprobe=2).collect()
    idx.optimize(files_per_bucket=4)
    assert idx.index.state_hash() == pre_hash
    after_files = idx.probe_plan_files(PROBE, nprobe=1)
    after_total = len(idx.index.manifest["files"])
    assert after_files < after_total  # cell-clustered files now skip
    post = idx.topk(PROBE, k=5, nprobe=2).collect()
    assert [(r["url"], round(r["score"], 9)) for r in pre] == [
        (r["url"], round(r["score"], 9)) for r in post
    ]
    # and further syncs keep working on the optimized index
    merge_batch(
        idx.source.refresh(),
        events(spark, 120, version=4, batch_id="b4"),
        "b4",
        transform=lambda d: d,
    )
    idx.sync()
    got = idx.topk(PROBE, k=5, nprobe=len(idx.centroids)).collect()
    want = brute_topk(idx.source, PROBE, 5)
    assert [r["url"] for r in got] == [r["url"] for r in want]


def test_open_recovers_centroids_and_cursor(spark, tmp_path):
    src = mk_corpus(spark, tmp_path)
    idx = VectorIndex.build(src, str(tmp_path / "idx"), k=3)
    cents = idx.centroids
    # re-open from disk (fresh process analog)
    idx2 = VectorIndex.open(
        src.refresh(), LakeTable.load(spark, str(tmp_path / "idx"))
    )
    assert idx2.centroids == cents
    assert idx2.sync().skipped  # cursor recovered: nothing to do


def test_build_rejects_empty_corpus(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "corpus"),
        TableSchema.from_struct(CORPUS),
        key="url",
        num_buckets=2,
    )
    with pytest.raises(ValueError, match="empty corpus"):
        VectorIndex.build(t, str(tmp_path / "idx"), k=2)
