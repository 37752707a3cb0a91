"""DBLog-style chunked snapshot bootstrap interleaved with the live
change tail (Andreoni & Bhatia, "DBLog: A Watermark Based Change-Data-
Capture Framework", Netflix 2019; the same algorithm ships as
Debezium's incremental snapshots).

Problem: bootstrapping a CDC replica of a large, LIVE source table.
A monolithic ``SELECT *`` snapshot either locks the source for hours
or races the tail: events that commit while the snapshot scan is
running are reflected in part of the scan and not the rest, so neither
"apply snapshot then tail" nor "tail then snapshot" converges.

DBLog's answer — and this module's — is to split the key space into
small CHUNKS and interleave them with tail batches:

* each chunk is a bounded key-range read of the live source, taken
  between a LOW and HIGH watermark position of the change log;
* a chunk row is SUPERSEDED (dropped) if any tail event for its key
  falls inside the chunk's watermark window — the source read may or
  may not reflect such an in-flight event, so the event (which will
  apply through its own batch) is the only safe authority;
* surviving chunk rows are stamped at the LOW watermark and applied
  as ordinary ``op='insert'`` change events: any tail event after the
  window beats them on timestamp, any event before the window is
  already folded into the source read they came from.

Composition, not new machinery: chunks become ordinary ledger batches
applied through :class:`~dbp_etl_spark.cdc.runner.CDCRunner`, so the
bootstrap inherits exactly-once (a replayed chunk batch id no-ops),
ordered apply, dead letters, lineage, and — the property a 10^10-row
bootstrap actually needs — CRASH RESUMABILITY PER CHUNK: a bootstrap
killed at chunk 412/1000 resumes from the ledger and re-reads only the
unapplied chunks, while the tail keeps applying throughout.

Reference analog: /root/reference/load/DBPLoadController.py:229-283
drains filesets one at a time with completion bookkeeping per fileset;
this is that shape for the "replica of a live table" problem, with the
watermark supersede rule making the interleaving CORRECT rather than
merely ordered.

Scale shape (100 TB lens): one chunk = one bucket-prunable key-range
read + one window-sliced anti-join (the window slice is partition- and
ts-prunable in the tail log), so peak memory and per-commit work are
O(chunk), never O(table). Chunk count trades commit overhead against
resume granularity; the tail is never paused.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbp_etl_spark.cdc.runner import CDCRunner, RunReport


@dataclass(frozen=True)
class ChunkSpec:
    """One snapshot chunk of the DBLog schedule.

    ``after_batch``: the tail batch id this chunk is applied after
    (the interleave point). ``low_ts``/``high_ts``: the chunk's
    watermark window — the source read happened between these two log
    positions, so tail events with ``low_ts <= ts <= high_ts`` for
    keys in the chunk supersede the chunk's rows. ``batch_id``: the
    ledger id the chunk commits under (distinct from every tail id).
    """

    chunk_id: int
    after_batch: object
    low_ts: object  # timestamp-like; compared against the tail's ts col
    high_ts: object
    batch_id: object


def plan_chunks(
    n_chunks: int,
    tail_batch_ids: Sequence,
    watermarks: Callable[[int], tuple],
    batch_id_fmt: str = "chunk-{:05d}",
) -> list[ChunkSpec]:
    """Spread ``n_chunks`` evenly across the tail's batch schedule.

    ``watermarks(chunk_id) -> (low_ts, high_ts)`` supplies the log
    positions the chunk's source read straddled; in production these
    come from the watermark rows the reader writes into the log (the
    DBLog signal table), in tests from the deterministic clock.
    """
    ids = list(tail_batch_ids)
    if not ids:
        raise ValueError("plan_chunks needs at least one tail batch id")
    out = []
    for c in range(n_chunks):
        # chunk c runs after tail batch floor(c * B / C) — even spread,
        # first chunk after the first batch (the tail starts first so
        # the log's watermark clock is already moving, as in DBLog)
        after = ids[min(c * len(ids) // n_chunks, len(ids) - 1)]
        lo, hi = watermarks(c)
        out.append(
            ChunkSpec(
                chunk_id=c,
                after_batch=after,
                low_ts=lo,
                high_ts=hi,
                batch_id=batch_id_fmt.format(c),
            )
        )
    return out


def chunk_predicate(key_col: str, chunk_id: int, n_chunks: int):
    """Deterministic hash key-range predicate for chunk ``chunk_id``.

    ``pmod(xxhash64(key), n_chunks)`` gives every chunk an equal-width,
    disjoint, exhaustive slice of the key space without knowing the key
    distribution — the hash plays the role of DBLog's PK-range cursor
    while staying skew-proof for string keys (a lexicographic range
    over ``url`` would put all of one host in one chunk). On a real
    source DB the same expression pushes down as a WHERE clause.
    """
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_chunks)) == F.lit(chunk_id)


def supersede_chunk(
    chunk_rows: DataFrame,
    tail: DataFrame,
    spec: ChunkSpec,
    key: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Apply the DBLog watermark rule to one chunk's source read.

    Drop every chunk row whose key has ANY tail event (write or
    delete) inside the chunk's watermark window — the source read
    raced those events, so their own batches are the authority.
    Survivors keep their SOURCE-authored ``ts_col`` (DBLog emits the
    row as read; the watermark guards the race window, it does not
    rewrite row content) and are typed ``op='insert'``. The ordering
    story then closes itself: a survivor's ts is the position of the
    last event folded into the source read, which is strictly below
    ``low_ts`` (anything at or past it was superseded away), so every
    post-window event outranks the survivor, and replaying the very
    event that authored it is an equal-ts equal-payload no-op.
    """
    window_keys = (
        tail.filter(
            (F.col(ts_col) >= F.lit(spec.low_ts)) & (F.col(ts_col) <= F.lit(spec.high_ts))
        )
        .select(key)
        .distinct()
    )
    return chunk_rows.join(window_keys, on=key, how="left_anti").withColumn(
        "op", F.lit("insert")
    )


def chunked_bootstrap(
    runner: CDCRunner,
    read_chunk: Callable[[ChunkSpec], DataFrame],
    tail: DataFrame,
    chunks: list[ChunkSpec],
    key: str = "url",
    ts_col: str = "warc_ts",
    batch_col: str = "batch_id",
) -> RunReport:
    """Run the full DBLog schedule: tail batches in order, snapshot
    chunks interleaved at their ``after_batch`` points, everything
    through the runner's ledger (exactly-once per tail batch AND per
    chunk; a crashed bootstrap resumes by re-running this function —
    committed batch ids and committed chunks no-op).

    ``read_chunk(spec)`` returns the LIVE source rows for the chunk's
    key range as of somewhere inside ``[low_ts, high_ts]`` — the whole
    point is that the exact position is unknown; the supersede rule
    makes any position in the window safe.
    """
    tail_ids = sorted(
        r[0] for r in tail.select(batch_col).distinct().collect()
    )  # bounded: one row per batch id
    by_point: dict = {}
    for spec in chunks:
        by_point.setdefault(spec.after_batch, []).append(spec)

    report = RunReport()
    import time as _time

    t0 = _time.time()
    for bid in tail_ids:
        batch = tail.filter(F.col(batch_col) == F.lit(bid))
        sub = runner.run(batch, batch_col=batch_col)
        _fold(report, sub)
        for spec in sorted(by_point.get(bid, []), key=lambda s: s.chunk_id):
            rows = supersede_chunk(read_chunk(spec), tail, spec, key=key, ts_col=ts_col)
            chunk_batch = rows.withColumn(batch_col, F.lit(spec.batch_id))
            sub = runner.run(chunk_batch, batch_col=batch_col)
            _fold(report, sub)
    report.wall_sec = _time.time() - t0
    return report


def _fold(into: RunReport, sub: RunReport) -> None:
    into.results.extend(sub.results)
    into.n_batches += sub.n_batches
    into.n_skipped += sub.n_skipped
    into.n_events += sub.n_events
