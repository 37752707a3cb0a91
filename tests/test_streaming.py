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


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState accumulator: state carries across
    microbatches; final totals equal a batch aggregation."""
    from dbp_etl_spark.streaming import running_user_totals_stream

    src = str(tmp_path / "ev")
    ev = spark.createDataFrame(
        [(1, 10, 1.5), (1, 20, 2.5), (2, 15, 10.0), (1, 30, 3.0), (2, 40, 5.0)],
        "user_id long, t long, value double",
    ).select("user_id", F.timestamp_seconds("t").alias("ts"), "value")
    # two files -> two microbatches with maxFilesPerTrigger=1
    ev.filter("t < 25").coalesce(1).write.parquet(src)
    ev.filter("t >= 25").coalesce(1).write.mode("append").parquet(src)

    q = running_user_totals_stream(
        spark, src, str(tmp_path / "ck"), query_name="rt", max_files_per_trigger=1
    )
    q.awaitTermination(120)
    # update-mode memory sink: last row per user wins
    rows = spark.sql(
        "SELECT user_id, n_events, total_value FROM rt"
    ).collect()
    last = {}
    for r in rows:  # rely on max n_events = latest state per user
        if r["user_id"] not in last or r["n_events"] > last[r["user_id"]][0]:
            last[r["user_id"]] = (r["n_events"], r["total_value"])
    assert last[1] == (3, 7.0)
    assert last[2] == (2, 15.0)


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


def test_checkpoint_recreate_not_nooped(spark, tmp_path):
    """Epoch ids restart at 0 when a checkpoint is recreated; the
    per-checkpoint ledger namespace must keep the new stream's batches
    from colliding with the old stream's 'stream-...-0' entry."""
    t = mk_table(spark, tmp_path, "nsp")

    ev1 = generate_changes(spark, 400, 40, n_batches=1, seed=21)
    src1 = str(tmp_path / "src1")
    ev1.coalesce(1).write.parquet(src1)
    q = run_stream(spark, src1, t, checkpoint_path=str(tmp_path / "ck1"))
    q.awaitTermination(120)
    t = t.refresh()
    keys1 = [k for k in t.committed_batches() if k.startswith("stream-")]
    assert keys1, "first stream committed nothing"

    # brand-new checkpoint + new source: epochs restart at 0
    ev2 = generate_changes(spark, 400, 40, n_batches=1, seed=22)
    src2 = str(tmp_path / "src2")
    ev2.coalesce(1).write.parquet(src2)
    h_before = t.state_hash()
    q2 = run_stream(spark, src2, t, checkpoint_path=str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    t = t.refresh()
    keys2 = [k for k in t.committed_batches() if k.startswith("stream-")]
    assert len(keys2) > len(keys1), "second stream was silently no-oped"
    assert t.state_hash() != h_before, "second stream's data never landed"


def test_watermarked_window_drops_late_events(spark, tmp_path):
    """ST2 windowed side: append-mode tumbling windows emit once the
    watermark passes; an event arriving behind the watermark is
    dropped (bounded state), on-time events aggregate normally.

    Two sequential availableNow runs over one checkpoint: run 1 ingests
    the on-time events and advances event time; run 2 sees only the
    late file, with run 1's watermark restored from the checkpoint."""
    from dbp_etl_spark.streaming import windowed_event_counts_stream

    src = str(tmp_path / "wm_src")
    ck = str(tmp_path / "wm_ck")
    base = 1_699_999_800  # multiple of 600s: tumbling windows align to epoch

    def batchfile(rows, mode="append"):
        spark.createDataFrame(rows, "user_id long, t long, value double").select(
            "user_id", F.timestamp_seconds("t").alias("ts"), "value"
        ).coalesce(1).write.mode(mode).parquet(src)

    batchfile(
        [
            (1, base + 60, 1.0),
            (2, base + 120, 2.0),          # window [base, base+600)
            (1, base + 700, 3.0),          # window [base+600, base+1200)
            (1, base + 10_000, 0.5),       # advances max event time
        ],
        mode="overwrite",
    )
    out = str(tmp_path / "wm_out")
    q = windowed_event_counts_stream(spark, src, ck, out)
    q.awaitTermination(120)

    # late event for the first window, far behind the restored
    # watermark (base+10000 - 1800) -> must be dropped
    batchfile([(3, base + 61, 100.0)])
    q2 = windowed_event_counts_stream(spark, src, ck, out)
    q2.awaitTermination(120)

    emitted = {
        r["window_start"].timestamp(): (r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert emitted[float(base)] == (2, 3.0), "late event leaked into the closed window"
    assert emitted[float(base + 600)] == (1, 3.0)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: an event redelivered in a later
    microbatch (inside the watermark) is suppressed; distinct events
    pass through."""
    from dbp_etl_spark.streaming.microbatch import deduped_changes_stream

    src = str(tmp_path / "dd_src")

    def f(rows, mode="append"):
        spark.createDataFrame(
            rows, "url string, t long, html binary, op string, batch_id long"
        ).select(
            "url", F.timestamp_seconds("t").alias("warc_ts"), "html", "op", "batch_id"
        ).coalesce(1).write.mode(mode).parquet(src)

    f([("u1", 100, b"<p>a</p>", "insert", 0)], mode="overwrite")
    f([("u1", 100, b"<p>a</p>", "insert", 0),  # exact redelivery
       ("u2", 200, b"<p>b</p>", "insert", 1)])

    out = str(tmp_path / "dd_out")
    q = deduped_changes_stream(
        spark, src, str(tmp_path / "dd_ck"), out, max_files_per_trigger=1
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2
    assert {r["url"] for r in rows} == {"u1", "u2"}


def test_stream_side_outputs_parity_with_runner(spark, tmp_path):
    """run_stream writes the same dead-letter / lineage artifacts as the
    batch CDCRunner (round-2 gap: only the batch runner had them)."""
    events = generate_changes(spark, 500, 40, n_batches=1, seed=7)
    bad = spark.createDataFrame(
        [
            (None, None, "boom"),  # null url -> dead letter
            ("https://bad.example/x", "frobnicate", "zap"),  # bad op
        ],
        "url string, op string, txt string",
    ).select(
        "url",
        F.timestamp_seconds(F.lit(1700000100)).alias("warc_ts"),
        F.encode("txt", "utf-8").alias("html"),
        "op",
        F.lit(0).cast("long").alias("batch_id"),
    )
    src = str(tmp_path / "changes")
    events.unionByName(bad).coalesce(1).write.parquet(src)

    t = mk_table(spark, tmp_path, "pages")
    errors_path = str(tmp_path / "errors")
    lineage_path = str(tmp_path / "lineage")
    q = run_stream(
        spark,
        src,
        t,
        checkpoint_path=str(tmp_path / "ckpt"),
        errors_path=errors_path,
        lineage_path=lineage_path,
    )
    q.awaitTermination(120)

    errors = spark.read.option("recursiveFileLookup", "true").parquet(errors_path)
    assert errors.count() == 2
    reasons = {r["message"] for r in errors.collect()}
    assert reasons == {"null_url", "bad_op"}
    assert all(r["batch_id"].startswith("stream-") for r in errors.collect())

    lineage = spark.read.option("recursiveFileLookup", "true").parquet(lineage_path)
    assert lineage.count() > 0
    acts = {r["action"] for r in lineage.collect()}
    assert "insert" in acts
    # per-bucket partition ids are real bucket ids of this table
    assert all(0 <= r["partition_id"] < t.num_buckets for r in lineage.collect())

    # and the applied state matches the batch runner over the same log
    t_batch = mk_table(spark, tmp_path, "batch")
    CDCRunner(t_batch).run(events.unionByName(bad))
    assert t.refresh().state_hash() == t_batch.state_hash()


def test_stream_inline_expiry(spark, tmp_path):
    """Streaming tail with expire_every: state matches the plain batch
    runner, metadata stays bounded by the retention window."""
    import os as _os

    events = generate_changes(spark, 1500, 80, n_batches=5, seed=13)
    src = str(tmp_path / "changes")
    events.repartition(5, "batch_id").write.parquet(src)

    t = mk_table(spark, tmp_path, "stream")
    q = run_stream(
        spark,
        src,
        t,
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        expire_every=2,
        expire_keep_last=2,
    )
    q.awaitTermination(120)
    t = t.refresh()

    t_batch = mk_table(spark, tmp_path, "batch")
    CDCRunner(t_batch).run(events.withColumn("batch_id", F.lit(0)))
    assert t.state_hash() == t_batch.state_hash()
    n_manifests = len(
        [f for f in _os.listdir(str(tmp_path / "stream" / "_meta")) if f.startswith("v")]
    )
    assert n_manifests <= 6  # bounded by window, not one per microbatch


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: responses within the interval
    match; a request with no response still emits under leftOuter once
    its wait expires (bounded state either way)."""
    from pyspark.sql import types as T

    from dbp_etl_spark.streaming import interval_join_streams

    req_schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("req_ts", T.TimestampType())]
    )
    resp_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("resp_ts", T.TimestampType()),
            T.StructField("status", T.IntegerType()),
        ]
    )
    base = 1700000000
    reqs = [("u1", base), ("u2", base + 60), ("u3", base + 120)]  # u3 never answered
    resps = [("u1", base + 30, 200), ("u2", base + 400, 304),  # u2 answers too late
             ("zz", base + 5000, 500)]  # advances the watermark past every wait window
    req_dir, resp_dir = str(tmp_path / "req"), str(tmp_path / "resp")
    spark.createDataFrame(
        [(u, t) for u, t in reqs], "url string, t long"
    ).select("url", F.timestamp_seconds("t").alias("req_ts")).write.parquet(req_dir)
    spark.createDataFrame(
        [(u, t, s) for u, t, s in resps], "url string, t long, status int"
    ).select("url", F.timestamp_seconds("t").alias("resp_ts"), "status").write.parquet(resp_dir)

    left = spark.readStream.schema(req_schema).parquet(req_dir)
    right = spark.readStream.schema(resp_schema).parquet(resp_dir)
    joined = interval_join_streams(
        left, right, key="url", left_ts="req_ts", right_ts="resp_ts",
        within="2 minutes", watermark="1 minute", how="leftOuter",
    )
    out_dir = str(tmp_path / "out")

    def run_once():
        q = (
            interval_join_streams(
                spark.readStream.schema(req_schema).parquet(req_dir),
                spark.readStream.schema(resp_schema).parquet(resp_dir),
                key="url", left_ts="req_ts", right_ts="resp_ts",
                within="2 minutes", watermark="1 minute", how="leftOuter",
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    del joined
    run_once()
    # a second pulse advances the watermark again so outer-join state
    # for expired waits is evicted and emitted
    # the GLOBAL watermark is min(left_wm, right_wm): BOTH streams must
    # advance before expired outer state can emit (multipleWatermarkPolicy
    # default) — pulse both sides, then run twice (emission lags a batch)
    for i, t in enumerate((9000, 13000)):
        spark.createDataFrame(
            [(f"zz{i + 2}", base + t, 500)], "url string, t long, status int"
        ).select(
            "url", F.timestamp_seconds("t").alias("resp_ts"), "status"
        ).write.mode("append").parquet(resp_dir)
        spark.createDataFrame([(f"qq{i + 2}", base + t)], "url string, t long").select(
            "url", F.timestamp_seconds("t").alias("req_ts")
        ).write.mode("append").parquet(req_dir)
        run_once()
    rows = {r["url"]: r for r in spark.read.parquet(out_dir).collect()}
    assert rows["u1"]["status"] == 200  # in-window match
    assert "u2" in rows and rows["u2"]["status"] is None  # response too late
    assert "u3" in rows and rows["u3"]["status"] is None  # never answered


def test_stream_patch_ops_parity(spark, tmp_path):
    """patch_ops on the streaming tail: sparse patches applied per
    microbatch match the batch runner's one-shot apply."""

    def pev(rows):
        return spark.createDataFrame(
            rows, "url string, ts long, html binary, score double, op string, batch_id long"
        ).select(
            "url", F.timestamp_seconds("ts").alias("warc_ts"), "html", "score", "op", "batch_id"
        )

    first = pev(
        [
            ("u1", 100, b"<p>a</p>", 1.0, "insert", 0),
            ("u2", 100, b"<p>b</p>", 2.0, "insert", 0),
        ]
    )
    second = pev(
        [
            ("u1", 200, None, 9.0, "patch", 1),  # score only; html kept
            ("u2", 50, None, 7.0, "patch", 1),  # late: no-op
        ]
    )
    src = str(tmp_path / "changes")
    # sequential writes => file mtime order => insert batch drains first
    first.coalesce(1).write.parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    t_stream = mk_table(spark, tmp_path, "stream_p")
    q = run_stream(
        spark,
        src,
        t_stream,
        checkpoint_path=str(tmp_path / "ckpt_p"),
        max_files_per_trigger=1,
        patch_ops=True,
        changes_schema=first.schema,  # score rides only if declared
    )
    q.awaitTermination(120)

    t_batch = mk_table(spark, tmp_path, "batch_p")
    CDCRunner(t_batch, patch_ops=True).run(
        first.unionByName(second).withColumn("batch_id", F.lit(0))
    )
    assert t_stream.state_hash() == t_batch.state_hash()
    got = {r["url"]: (r["text"], r["score"]) for r in t_stream.read().collect()}
    assert got == {"u1": ("a", 9.0), "u2": ("b", 2.0)}


def test_streaming_dedup_extra_column_distinct(spark, tmp_path):
    """The redelivery hash covers declared extra payload columns: two
    events identical except for an extra column are DISTINCT (html-only
    hashing used to drop one nondeterministically)."""
    from pyspark.sql import types as T

    from dbp_etl_spark.streaming.microbatch import deduped_changes_stream

    src = str(tmp_path / "ddx_src")
    schema_df = spark.createDataFrame(
        [
            ("u1", 100, b"<p>a</p>", 1.0, "update", 0),
            ("u1", 100, b"<p>a</p>", 2.0, "update", 0),  # differs ONLY in score
            ("u1", 100, b"<p>a</p>", 2.0, "update", 1),  # true redelivery
        ],
        "url string, t long, html binary, score double, op string, batch_id long",
    ).select(
        "url", F.timestamp_seconds("t").alias("warc_ts"), "html", "score", "op", "batch_id"
    )
    schema_df.coalesce(1).write.parquet(src)
    out = str(tmp_path / "ddx_out")
    q = deduped_changes_stream(
        spark,
        src,
        str(tmp_path / "ddx_ck"),
        out,
        changes_schema=schema_df.schema,
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2  # both distinct events survive; redelivery dropped
    assert sorted(r["score"] for r in rows) == [1.0, 2.0]
