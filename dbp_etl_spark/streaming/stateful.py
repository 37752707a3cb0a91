"""Custom stateful streaming operator via applyInPandasWithState.

Running per-key totals maintained across microbatches — the minimal
custom stateful operator shape (the reference's analog is run-status
accumulation across filesets, /root/reference/load/RunStatus.py:28-48).
State is a (count, total) pair per key; each microbatch emits the
updated totals for keys it touched (update-style output).

At scale: state is partitioned by key across executors and checkpointed
by the streaming engine; the pandas function sees one key's rows per
call with Arrow batching.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dbp_etl_spark.streaming.microbatch import CHANGES_SCHEMA  # noqa: F401  (same source dir convention)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _accumulate(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals_stream(
    spark: SparkSession,
    events_path: str,
    checkpoint_path: str,
    query_name: str = "running_totals",
    max_files_per_trigger: int | None = None,
):
    """Tail an events directory; maintain running (count, sum) per user
    across microbatches. Returns the started StreamingQuery writing to
    an in-memory sink named ``query_name`` (update mode)."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)
    out = stream.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def windowed_event_counts_stream(
    spark,
    source_path: str,
    checkpoint_path: str,
    output_path: str,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Watermarked tumbling-window aggregation over an event stream.

    The canonical late-data pattern (SURVEY ST2's windowed side):
    ``withWatermark`` bounds how long window state is kept; events
    older than (max event time seen - watermark) are dropped instead of
    growing state forever — the streaming analog of the MERGE path's
    late-event guard. Append output mode: a window emits exactly once,
    when the watermark passes its end (exactly-once per window for
    downstream sinks).

    Source schema: (user_id long, ts timestamp, value double) parquet.
    Sink: parquet at ``output_path`` (checkpoint-recoverable, unlike
    the memory sink) with columns window_start, window_end, n_events,
    total_value. Returns the started StreamingQuery.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
