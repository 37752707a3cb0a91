"""Multi-source change-tail merge with fixed source precedence.

A deployment rarely has ONE change log: a sharded upstream emits one
binlog per shard, a dual-region primary/DR pair emits two overlapping
tails, a backfill exporter runs next to the live tail. Applying them
independently makes the final state order-dependent; the engine
instead merges the tails into ONE totally-ordered change batch before
the normal dedup → MERGE path.

Conflict rule (the reference analog is the fixed-precedence merge of
language names from multiple metadata sources — priority-9 English
name beats heart-language name beats alternates,
/root/reference/load/UpdateDBPLanguageTranslation.py:47-118): latest
event timestamp wins across ALL sources; at an equal timestamp the
LOWER priority number (more authoritative source) wins; remaining ties
fall through the standard CDC order (delete-beats-write, payload md5,
full-row hash), so the winner is total and partition-invariant.

Scale shape: the union is a zero-shuffle concatenation of the source
scans; the only shuffle is the per-key dedup itself — identical cost
to a single-source batch of the combined volume. Priority is a
column, not a join, so no source is collected or broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbp_etl_spark.cdc.dedup import dedup_latest

SRC_COL = "_src_pri"


def source_order(
    ts_col: str = "warc_ts",
    op_col: str = "op",
    payload_col: str = "html",
    src_col: str = SRC_COL,
) -> list[Column]:
    """CDC total order extended with source precedence: ts desc, then
    source priority asc (nulls last — an untagged event loses to any
    tagged one), then delete-beats-write, then payload md5. Priority
    sits ABOVE the delete tiebreak deliberately: at an equal ts, the
    authoritative source's write beats a lower source's tombstone —
    the DR replica must not erase what the primary asserts."""
    is_delete = F.when(F.col(op_col) == "delete", 1).otherwise(0)
    return [
        F.col(ts_col).desc(),
        F.col(src_col).asc_nulls_last(),
        is_delete.desc(),
        F.md5(F.col(payload_col)).desc_nulls_last(),
    ]


def merge_tails(
    tails: list[tuple[DataFrame, int]],
    key: str | list[str] = "url",
    ts_col: str = "warc_ts",
    op_col: str = "op",
    payload_col: str = "html",
    salt_buckets: int = 0,
    keep_src: bool = False,
) -> DataFrame:
    """Merge several change tails into one per-key-deduped batch.

    ``tails`` is ``[(frame, priority), ...]``; lower priority number =
    more authoritative at an equal timestamp. Frames must share the
    change-event schema (aligned by name; missing columns in one tail
    are NOT tolerated — schema drift between tails is an upstream
    contract violation better surfaced loudly than nulled over).

    Returns one row per key — the winner under :func:`source_order` —
    ready for ``CDCRunner.run``/``merge_batch``. With ``keep_src`` the
    winning row keeps its ``_src_pri`` tag for lineage ("which source
    produced the applied row").
    """
    if not tails:
        raise ValueError("merge_tails needs at least one (frame, priority) tail")
    cols = tails[0][0].columns
    for frame, _ in tails[1:]:
        if set(frame.columns) != set(cols):
            raise ValueError(
                f"tail schema mismatch: {sorted(cols)} vs {sorted(frame.columns)}"
            )
    tagged = [
        frame.select(*cols).withColumn(SRC_COL, F.lit(int(pri)))
        for frame, pri in tails
    ]
    union = tagged[0]
    for frame in tagged[1:]:
        union = union.unionByName(frame)
    out = dedup_latest(
        union,
        key,
        source_order(ts_col, op_col, payload_col),
        salt_buckets=salt_buckets,
    )
    return out if keep_src else out.drop(SRC_COL)
