"""Streaming table-to-table replication: ``lake_cdf`` → replica MERGE.

The capstone wiring of changes-out: a Structured Streaming query tails
one lake table's committed change feed and maintains another lake
table as its exactly-once replica — the streaming sibling of
``cdc/replicate.py::TableReplicator`` (same filter/transform options, same ledger scheme, interchangeable cursor: a
deployment can alternate batch ``sync()`` calls and this stream
against the same target).

Exactly-once is belt-and-braces, and neither layer alone suffices:

* Spark's streaming checkpoint dedupes offset ranges — but
  ``foreachBatch`` is at-least-once on crash replays.
* The target's batch ledger (``repl::<name>::<to_snapshot>``) makes a
  replayed window a no-op — and because the id is derived from the
  SOURCE SNAPSHOT RANGE, not the epoch, it stays correct across
  checkpoint deletion/recreation (a recreated stream re-delivers old
  windows; the cursor guard below skips them instead of regressing
  the replica).

Physical shape: each microbatch reads only its window's changelog
files (executor-side Arrow), net-merges per key (one churn-sized
shuffle), and the apply writes only the target buckets the feed
touches — O(window churn) end to end, the table itself never scanned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbp_etl_spark.lake.table import LakeTable
from dbp_etl_spark.streaming.cdf_source import read_change_stream


def _net_per_key(batch, key: str):
    """Collapse a multi-commit microbatch (one row per key PER COMMIT)
    to the last change per key — sufficient for replica apply, which
    needs final values + died-or-not, never intermediate hops."""
    rows = batch.filter(F.col("_change_type") != "update_pre")
    others = [
        c for c in rows.columns if c not in (key, "_change_type", "_commit_snapshot")
    ]
    packed = F.struct(
        *[F.col(c).alias(c) for c in others],
        F.col("_change_type").alias("_change_type"),
    )
    g = rows.groupBy(key).agg(
        F.max_by(packed, F.col("_commit_snapshot")).alias("_l")
    )
    return g.select(
        F.col(key),
        *[F.col("_l").getField(c).alias(c) for c in others],
        F.col("_l").getField("_change_type").alias("_change_type"),
    )


def replicate_stream(
    spark,
    source_root: str,
    target: LakeTable,
    checkpoint: str,
    name: str = "stream",
    where=None,
    transform=None,
    key_expand=None,
    available_now: bool = True,
    **source_options,
):
    """Start (and return) the replication StreamingQuery.

    ``available_now=True`` drains the current backlog and stops — the
    scheduled-catch-up deployment shape; ``False`` runs continuously.
    ``key_expand`` enables 1->N fan-out targets (same contract as
    ``TableReplicator(key_expand=...)``) — e.g. a streaming-maintained
    LSH posting index (operators/neardup_index.py:NearDupIndex.tail).
    ``source_options`` pass through to the ``lake_cdf`` reader (e.g.
    ``maxSnapshotsPerBatch`` to bound per-trigger work — pair it with
    ``available_now=False`` + ``processAllAvailable()``: Spark's
    availableNow falls back to a SINGLE batch for python sources, which
    a per-trigger cap would truncate).
    """
    from dbp_etl_spark.cdc.replicate import TableReplicator

    source_options.setdefault("startingSnapshot", 0)
    stream_start = int(str(source_options["startingSnapshot"]))

    def apply_batch(batch, _epoch_id: int) -> None:
        bounds = batch.agg(F.max("_commit_snapshot").alias("hi")).first()
        if bounds["hi"] is None:
            return  # window held only no-row commits
        hi = int(bounds["hi"])
        rep = TableReplicator(
            LakeTable.load(spark, source_root),
            LakeTable.load(spark, target.root),
            name=name,
            where=where,
            transform=transform,
            key_expand=key_expand,
        )
        cur = rep.cursor()
        if cur is not None and hi <= cur:
            return  # recreated checkpoint re-delivering an old window
        # contiguity: the stream delivers every row-bearing commit after
        # stream_start, so the only real gap is a replica whose cursor
        # predates the stream's own start (changes in (cur, start] would
        # be lost). Commits inside a window that emitted no rows
        # (compaction, tags, empty merges) are benign and expected.
        if (cur if cur is not None else 0) < stream_start:
            raise ValueError(
                f"replication gap: the stream starts at snapshot "
                f"{stream_start} but the replica cursor is at {cur} — start "
                "the stream at (or before) the cursor, or bootstrap with "
                "TableReplicator.sync() first"
            )
        apply = rep._apply_fanout if key_expand is not None else rep._apply
        apply(_net_per_key(batch, rep.source.key), f"{rep._prefix}{hi}")

    writer = (
        read_change_stream(spark, source_root, **source_options)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
