"""Structured-Streaming tail: drain, exactly-once restart, parity with
the batch runner."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.cdc import CDCRunner, generate_changes
from dbp_etl_spark.lake import LakeTable, TableSchema
from dbp_etl_spark.streaming import run_stream

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def mk_table(spark, tmp_path, name):
    return LakeTable.create(
        spark, str(tmp_path / name), TableSchema.from_struct(PAGES), key="url", num_buckets=8
    )


def test_stream_drain_matches_batch_runner(spark, tmp_path):
    events = generate_changes(spark, 2000, 100, n_batches=3, seed=11)
    src = str(tmp_path / "changes")
    # one file per batch => one-ish microbatch per file with maxFilesPerTrigger=1
    events.repartition(3, "batch_id").write.parquet(src)

    t_stream = mk_table(spark, tmp_path, "stream")
    q = run_stream(
        spark,
        src,
        t_stream,
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    # batch runner over the same events as ONE batch (cross-batch
    # guards make grouping irrelevant to final state)
    t_batch = mk_table(spark, tmp_path, "batch")
    CDCRunner(t_batch).run(events.withColumn("batch_id", F.lit(0)))
    assert t_stream.state_hash() == t_batch.state_hash()
    # ledger recorded stream epochs
    assert any(k.startswith("stream-") for k in t_stream.committed_batches())


def test_stream_restart_is_exactly_once(spark, tmp_path):
    events = generate_changes(spark, 1000, 60, n_batches=2, seed=12)
    src = str(tmp_path / "changes2")
    events.write.parquet(src)
    table = mk_table(spark, tmp_path, "restart")
    ckpt = str(tmp_path / "ckpt2")

    q1 = run_stream(spark, src, table, checkpoint_path=ckpt)
    q1.awaitTermination(120)
    h1 = table.state_hash()
    snap1 = table.snapshot_id

    # restart against the same checkpoint: nothing new -> no new commits
    q2 = run_stream(spark, src, table.refresh(), checkpoint_path=ckpt)
    q2.awaitTermination(120)
    t2 = table.refresh()
    assert t2.state_hash() == h1
    assert t2.snapshot_id == snap1
