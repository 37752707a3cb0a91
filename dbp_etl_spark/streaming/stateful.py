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
