"""SCD Type 2 history maintenance over the change-event tail.

The engine's main product is latest-state-per-key (the CDC table).
Many consumers of the same tail need the *history*: every version a
key ever had, with its validity interval — the classic slowly-changing
-dimension type 2 shape:

    entity_url | valid_from | valid_to | is_current | payload…

Reference analog: the reference keeps full load history in run/batch
bookkeeping tables and re-derivable per-version filesets
(/root/reference/load/RunStatus.py:28-48,
/root/reference/load/UpdateDBPFilesetTables.py:64-118); SCD2 is the
lake-native generalization — one table that answers both "state now"
(``is_current``) and "state as of T" (``valid_from <= T < valid_to``).

Semantics (deterministic, batch-split invariant for a time-partitioned
tail):

* events are first deduplicated to ONE winner per (entity, ts) under
  the engine's total order (cdc/dedup.py cdc_order: delete beats
  write, then payload md5) — the same order the latest-state path
  uses, so the SCD2 current rows agree with the CDC table;
* each surviving write opens an interval at its ts; the next event of
  the same entity (write OR delete) closes it (``valid_to`` = next ts,
  exclusive); delete events close intervals but never appear as rows;
* an event older than the entity's open interval is LATE and is
  dropped — identical to the latest-state late guard. With a
  time-partitioned tail (batch boundaries = event-time boundaries,
  the binlog-tail norm) no event is ever late, and the incremental
  result equals the one-shot derivation over the full log
  (test_scd2.py asserts this equivalence).

Implementation: history maintenance IS CDC — each batch is rewritten
into upserts on a *versioned synthetic key* (``entity@epoch_micros``)
and applied through the standard ``merge_batch``. Exactly-once,
atomic commit, replay-skip, schema evolution, lineage and the
dead-letter path all come from the existing machinery instead of a
parallel implementation:

* a new version INSERTs its synthetic key (open: valid_to NULL);
* closing an interval is an UPDATE of that same synthetic key (its
  row version ``warc_ts`` advances to the closing event's ts, so the
  merge ladder's strictly-newer branch applies it);
* closed rows are immutable — no event can target their keys again.

Scale: the per-batch window partitions by entity (state = one batch's
events per entity, bounded); the merge shuffles by synthetic key,
which is strictly finer than entity, so hot entities spread across
versions. The open-row lookup reads ``is_current`` rows semi-joined
to the batch's entities; on a 10^10-row history the deployment-shape
fix is a companion current-state table (the CDC table the engine
already maintains) carrying the open synthetic key, making the lookup
a bucket-pruned read — the lookup here is a single filtered scan kept
simple deliberately and measured in BENCH notes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbp_etl_spark.cdc.dedup import cdc_order, dedup_latest
from dbp_etl_spark.cdc.merge import MergeResult, merge_batch
from dbp_etl_spark.lake.schema import TableSchema
from dbp_etl_spark.lake.table import LakeTable

# columns the runner owns; everything else on the change events is payload
_META = ("url", "warc_ts", "op")


def scd2_schema(payload: dict[str, str]) -> TableSchema:
    """History-table schema for a given payload column set
    (``{name: lake_type}``). The synthetic version key is ``url`` and
    the payload anchor is ``html`` — the engine-wide CDC conventions —
    so the standard merge path applies unchanged."""
    from dbp_etl_spark.lake.schema import ColumnSpec

    cols = [
        ("url", "string"),  # synthetic: entity@epoch_micros(valid_from)
        ("warc_ts", "timestamp"),  # row version ts (advances when closed)
        ("html", "binary"),
        ("text", "string"),  # derived per version by the merge transform
        ("lang", "string"),
        ("entity_url", "string"),
        ("valid_from", "timestamp"),
        ("valid_to", "timestamp"),
        ("is_current", "boolean"),
        *payload.items(),
    ]
    return TableSchema([ColumnSpec(i + 1, n, t) for i, (n, t) in enumerate(cols)])


def _dedup_per_entity_ts(changes: DataFrame) -> DataFrame:
    """One winner per (entity, ts) under the engine total order.

    cdc_order's leading ts term is constant within the group, so the
    effective order is delete-beats-write then payload md5 — identical
    ties to the latest-state path."""
    return dedup_latest(changes, ["url", "warc_ts"], cdc_order())


def scd2_intervals(changes: DataFrame, payload_cols: list[str] | None = None) -> DataFrame:
    """One-shot SCD2 derivation over a FULL change log (the batch
    recompute the incremental runner must match; also the cheap path
    for a first backfill).

    Input: engine change events (url, warc_ts, html, op, extras).
    Output: entity_url, valid_from, valid_to, is_current, html, extras.
    """
    if payload_cols is None:
        payload_cols = [c for c in changes.columns if c not in _META]
    dd = _dedup_per_entity_ts(changes)
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").asc())
    out = (
        dd.withColumn("valid_to", F.lead("warc_ts").over(w))
        .filter(F.col("op") != "delete")
        .select(
            F.col("url").alias("entity_url"),
            F.col("warc_ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
            F.col("html"),
            *[F.col(c) for c in payload_cols if c != "html"],
        )
    )
    return out


@dataclass
class SCD2Report:
    results: list[MergeResult] = field(default_factory=list)
    n_batches: int = 0
    n_skipped: int = 0
    n_late: int = 0  # populated only when count_late=True


class SCD2Runner:
    """Incrementally maintain an SCD2 history table from a change tail.

    ``hist`` must be a LakeTable with ``scd2_schema(...)`` columns
    (key='url' = the synthetic version key). Batches apply in batch-id
    order with the ledger's exactly-once replay skip, one atomic
    commit per batch.
    """

    def __init__(self, hist: LakeTable, salt_buckets: int = 16, count_late: bool = False):
        self.hist = hist
        self.salt_buckets = salt_buckets
        self.count_late = count_late

    # ------------------------------------------------------------ plumbing

    def _payload_cols(self, changes: DataFrame, batch_col: str) -> list[str]:
        return [c for c in changes.columns if c not in _META and c != batch_col]

    def _entity_state(
        self, entities: DataFrame, payload_cols: list[str]
    ) -> tuple[DataFrame, DataFrame]:
        """(open rows as pseudo-events, per-entity frontier) for the
        given entities.

        The frontier is max(warc_ts) over ALL of the entity's history
        rows — warc_ts is the row-version ts (valid_to once closed),
        so for an open entity the frontier is its open valid_from, and
        for a delete-closed entity it is the DELETE's ts. Deriving it
        from the open row alone would let an out-of-contract event
        older than a closing delete re-open an overlapping interval,
        where the latest-state table's tombstone guard suppresses the
        same event (test_late_event_after_delete_is_dropped)."""
        slice_ = self.hist.read().join(
            entities, F.col("entity_url") == entities["_e"], "left_semi"
        )
        frontier = slice_.groupBy("entity_url").agg(F.max("warc_ts").alias("_frontier"))
        opened = slice_.filter(F.col("is_current")).select(
            F.col("entity_url").alias("url"),
            F.col("valid_from").alias("warc_ts"),
            F.col("html"),
            F.lit("update").alias("op"),
            F.lit(True).alias("_existing"),
            *[F.col(c) for c in payload_cols if c != "html"],
        )
        return opened, frontier.select(
            F.col("entity_url").alias("_fe"), F.col("_frontier")
        )

    def _batch_events(self, batch: DataFrame, payload_cols: list[str]) -> DataFrame:
        dd = _dedup_per_entity_ts(batch)
        return dd.select(
            "url",
            "warc_ts",
            "html",
            "op",
            F.lit(False).alias("_existing"),
            *[F.col(c) for c in payload_cols if c != "html"],
        )

    def _versioned_upserts(
        self, batch: DataFrame, payload_cols: list[str]
    ) -> tuple[DataFrame, DataFrame]:
        """Rewrite one batch into upserts on the synthetic version key.

        Returns (upserts, late) — ``late`` is lazily defined and only
        counted when count_late is on."""
        fresh = self._batch_events(batch, payload_cols)
        entities = fresh.select(F.col("url").alias("_e")).distinct()
        opened, frontier = self._entity_state(entities, payload_cols)

        # late guard: a batch event at or before the entity's frontier
        # can no longer change history (closed rows are immutable)
        joined = fresh.join(frontier, fresh["url"] == frontier["_fe"], "left")
        late = joined.filter(
            F.col("_frontier").isNotNull() & (F.col("warc_ts") <= F.col("_frontier"))
        )
        live = joined.filter(
            F.col("_frontier").isNull() | (F.col("warc_ts") > F.col("_frontier"))
        ).drop("_fe", "_frontier")

        # entities with no live fresh event need no rewrite at all
        touched = live.filter(~F.col("_existing")).select(F.col("url").alias("_t")).distinct()
        combined = live.unionByName(
            opened.join(touched, opened["url"] == touched["_t"], "left_semi")
        )

        w = Window.partitionBy("url").orderBy(F.col("warc_ts").asc())
        nxt = F.lead("warc_ts").over(w)
        upserts = (
            combined.withColumn("_valid_to", nxt)
            .filter(F.col("op") != "delete")
            # re-emitting an untouched open row would be a no-op merge
            # anyway; skip the write entirely
            .filter(~(F.col("_existing") & F.col("_valid_to").isNull()))
            .select(
                F.concat_ws(
                    "@", F.col("url"), F.unix_micros(F.col("warc_ts")).cast("string")
                ).alias("url"),
                # the row's version ts: advances to the closing ts when
                # the interval closes, so the merge ladder's
                # strictly-newer branch applies the close
                F.coalesce(F.col("_valid_to"), F.col("warc_ts")).alias("warc_ts"),
                F.col("html"),
                F.lit("update").alias("op"),
                F.col("url").alias("entity_url"),
                F.col("warc_ts").alias("valid_from"),
                F.col("_valid_to").alias("valid_to"),
                F.col("_valid_to").isNull().alias("is_current"),
                *[F.col(c) for c in payload_cols if c != "html"],
            )
        )
        return upserts, late

    # ------------------------------------------------------------- driving

    def apply_batch(self, batch: DataFrame, batch_id) -> MergeResult:
        if self.hist.is_committed(batch_id):
            return MergeResult(batch_id=batch_id, skipped=True, snapshot_id=self.hist.snapshot_id)
        payload_cols = self._payload_cols(batch, batch_col="")
        upserts, late = self._versioned_upserts(batch, payload_cols)
        n_late = late.count() if self.count_late else 0
        res = merge_batch(
            self.hist, upserts, batch_id, salt_buckets=self.salt_buckets
        )
        res.counts["scd2_late_dropped"] = n_late
        return res

    def run(self, changes: DataFrame, batch_col: str = "batch_id") -> SCD2Report:
        """Apply every batch in batch-id order (the tail contract:
        batch boundaries are event-time boundaries)."""
        batch_ids = [r[0] for r in changes.select(batch_col).distinct().collect()]
        report = SCD2Report()
        for b in sorted(batch_ids):
            report.n_batches += 1
            if self.hist.is_committed(b):
                report.n_skipped += 1
                report.results.append(
                    MergeResult(batch_id=b, skipped=True, snapshot_id=self.hist.snapshot_id)
                )
                continue
            batch = changes.filter(F.col(batch_col) == F.lit(b)).drop(batch_col)
            res = self.apply_batch(batch, b)
            report.n_late += res.counts.get("scd2_late_dropped", 0)
            report.results.append(res)
        return report
