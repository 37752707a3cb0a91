"""Debezium-envelope CDC source adapter.

Debezium (the de-facto open-source binlog/WAL tail: MySQL binlog,
Postgres logical decoding, Mongo oplog) emits one JSON envelope per
row change:

    {"payload": {"op": "c|r|u|d", "ts_ms": 1706140800000,
                 "before": {...row image...} | null,
                 "after":  {...row image...} | null}}

``from_debezium`` maps a DataFrame of such envelopes (one JSON string
per row — what a Kafka value column or a file tail yields) to the
engine's change-event schema, so a user can point an existing Debezium
topic at ``CDCRunner.run`` unchanged:

* op ``c`` (create), ``r`` (snapshot read) and ``u`` (update) take the
  AFTER image; the engine's MERGE ladder makes the insert/update
  distinction itself from table state, so all three map to
  ``op='update'`` semantics-equivalently (an absent key inserts);
* op ``d`` maps to ``op='delete'``; the key comes from the BEFORE
  image (Debezium deletes carry ``after: null``);
* ``ts_ms`` (epoch millis) becomes ``warc_ts`` — the event-time that
  drives the late-event guard;
* ``binary`` row fields arrive base64-encoded (Debezium's JSON binary
  handling mode ``base64``) and are decoded here.

The whole mapping is JVM expressions (``from_json`` + column ops) —
no Python in the hot path, safe for a 10^10-event tail.

Reference analog: the reference tails database state by re-reading it
per load (/root/reference/load/DBPLoadController.py:118-141); a
Debezium feed is the modern WAL-shaped form of the same signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def debezium_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """The envelope struct for ``from_json``, given the row image
    schema (binary fields must be declared STRING here: Debezium ships
    them base64 in JSON; ``from_debezium`` decodes them)."""
    wire = T.StructType(
        [
            T.StructField(
                f.name, T.StringType() if isinstance(f.dataType, T.BinaryType) else f.dataType
            )
            for f in row_schema.fields
        ]
    )
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("op", T.StringType()),
                        T.StructField("ts_ms", T.LongType()),
                        T.StructField("before", wire),
                        T.StructField("after", wire),
                    ]
                ),
            )
        ]
    )


def from_debezium(
    envelopes: DataFrame,
    row_schema: T.StructType,
    key: str = "url",
    value_col: str = "value",
    batch_col: str | None = None,
) -> DataFrame:
    """Map Debezium JSON envelopes to the engine's change-event columns.

    ``envelopes``: DataFrame with a JSON-string column ``value_col``
    (plus optionally ``batch_col`` to carry through — e.g. a Kafka
    partition-offset bucket or file batch id). ``row_schema``: the
    row image as engine types (binary columns as BinaryType — the
    base64 transit encoding is handled here). Rows whose envelope
    fails to parse come out with a NULL key and dead-letter inside
    ``merge_batch`` (null_url) rather than killing the tail.
    """
    p = F.from_json(F.col(value_col), debezium_envelope_schema(row_schema)).getField(
        "payload"
    )
    is_delete = p.getField("op") == "d"
    image = F.when(is_delete, p.getField("before")).otherwise(p.getField("after"))
    cols = [
        image.getField(key).alias(key),
        F.timestamp_millis(p.getField("ts_ms")).alias("warc_ts"),
    ]
    for f in row_schema.fields:
        if f.name in (key, "warc_ts"):
            continue
        c = image.getField(f.name)
        if isinstance(f.dataType, T.BinaryType):
            # delete images may omit payload columns entirely; unbase64
            # of NULL stays NULL
            c = F.unbase64(c)
        cols.append(F.when(is_delete, F.lit(None).cast(f.dataType)).otherwise(c).alias(f.name))
    cols.append(F.when(is_delete, "delete").otherwise("update").alias("op"))
    if batch_col is not None:
        cols.append(F.col(batch_col))
    return envelopes.select(*cols)
