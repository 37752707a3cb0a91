"""Watermarked stream-stream joins (bounded state).

The canonical use in a web-crawl CDC context: correlate two unbounded
event streams — e.g. fetch *requests* with fetch *responses*, or page
writes with later quality verdicts — without unbounded join state.
Both sides carry watermarks and the join predicate carries a time
bound, so Spark can evict state once the watermark passes the bound
(the standard interval-join recipe from the Structured Streaming
guide; without BOTH constraints state grows forever).

Reference analog: the reference correlates its run artifacts by key
after the fact in batch (/root/reference/load/RunStatus.py:28-48);
this is the online generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING DataFrames on ``key`` where the right event
    lands in ``[left_ts, left_ts + within]``.

    Both inputs get a watermark; the time-range predicate lets the
    state store drop a row once no counterpart can still arrive —
    state is bounded by (watermark + within) of data per key, not by
    the stream length. ``how='leftOuter'`` additionally emits
    unmatched left rows (NULL right columns) after their wait expires
    — the "request that never got a response" detector.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    joined = lw.join(rw, cond, how)
    # drop the duplicate right-side key column, keep both timestamps
    return joined.drop(rw[key])
