"""Maxwell- and Canal-envelope CDC source adapters.

Debezium (sources/debezium.py) is one of three JSON wire formats that
dominate open-source MySQL binlog tails; the other two are Maxwell's
daemon and Alibaba Canal's "flat message". Supporting all three means
a user can point whichever topic they already run at ``CDCRunner.run``
unchanged — the same generalization of the reference's
tail-the-database signal
(/root/reference/load/DBPLoadController.py:118-141).

Maxwell emits one envelope per row change::

    {"database": "db", "table": "pages", "type": "insert|update|delete",
     "ts": 1706140800,            # epoch SECONDS
     "data": {...full row image...},
     "old":  {...changed columns' previous values...}}

* ``data`` always carries the FULL row image — the after image for
  insert/update, the deleted row's image for delete (unlike Debezium,
  which splits before/after);
* ``type`` values ``insert``, ``update`` and ``bootstrap-insert`` (the
  initial-snapshot rows) all map to the engine's upsert op — the MERGE
  ladder makes the insert/update distinction from table state;
* binary columns are expected base64-encoded in the JSON (the same
  transit convention the Debezium adapter documents).

Canal's flat message batches MULTIPLE rows per envelope and renders
every column value as a STRING::

    {"database": "db", "table": "pages", "type": "INSERT|UPDATE|DELETE",
     "es": 1706140800000,          # source event time, epoch MILLIS
     "data": [{...row as strings...}, ...],
     "old":  [{...}, ...] | null}

so the adapter explodes ``data`` and casts each field back to the
engine schema (timestamps via the JDBC-style 'yyyy-MM-dd HH:mm:ss'
rendering Canal uses, binary via base64).

Both adapters are pure JVM expressions (``from_json`` + column ops,
one ``explode`` for Canal) — no Python in the hot path, safe for a
10^10-event tail. Malformed envelopes surface as NULL-key rows and
dead-letter inside ``merge_batch`` rather than killing the tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _wire_struct(row_schema: T.StructType, all_strings: bool = False) -> T.StructType:
    """Row-image struct as it appears on the wire: binary fields ship
    base64 (so STRING), and Canal ships EVERY field as STRING."""
    return T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType()
                if all_strings or isinstance(f.dataType, T.BinaryType)
                else f.dataType,
            )
            for f in row_schema.fields
        ]
    )


def maxwell_envelope_schema(row_schema: T.StructType) -> T.StructType:
    wire = _wire_struct(row_schema)
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("data", wire),
            T.StructField("old", wire),
        ]
    )


def canal_envelope_schema(row_schema: T.StructType) -> T.StructType:
    wire = _wire_struct(row_schema, all_strings=True)
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("es", T.LongType()),
            T.StructField("data", T.ArrayType(wire)),
            T.StructField("old", T.ArrayType(wire)),
        ]
    )


def _project_image(image, is_delete, row_schema: T.StructType, key: str, ts_col):
    """Shared image→change-event projection: key + warc_ts + payload
    columns (nulled on delete, base64-decoded where binary) + op."""
    cols = [image.getField(key).alias(key), ts_col.alias("warc_ts")]
    for f in row_schema.fields:
        if f.name in (key, "warc_ts"):
            continue
        c = image.getField(f.name)
        if isinstance(f.dataType, T.BinaryType):
            c = F.unbase64(c)
        cols.append(
            F.when(is_delete, F.lit(None).cast(f.dataType)).otherwise(c).alias(f.name)
        )
    cols.append(F.when(is_delete, "delete").otherwise("update").alias("op"))
    return cols


def from_maxwell(
    envelopes: DataFrame,
    row_schema: T.StructType,
    key: str = "url",
    value_col: str = "value",
    batch_col: str | None = None,
) -> DataFrame:
    """Map Maxwell JSON envelopes to the engine's change-event columns.

    ``envelopes``: DataFrame with one Maxwell JSON string per row in
    ``value_col`` (plus optionally ``batch_col`` to carry through).
    ``row_schema``: the row image as engine types; binary columns are
    decoded from their base64 transit form.
    """
    p = F.from_json(F.col(value_col), maxwell_envelope_schema(row_schema))
    is_delete = F.lower(p.getField("type")) == "delete"
    image = p.getField("data")  # full row image for every op, deletes included
    ts_col = F.timestamp_seconds(p.getField("ts"))
    cols = _project_image(image, is_delete, row_schema, key, ts_col)
    if batch_col is not None:
        cols.append(F.col(batch_col))
    return envelopes.select(*cols)


def from_canal(
    envelopes: DataFrame,
    row_schema: T.StructType,
    key: str = "url",
    value_col: str = "value",
    batch_col: str | None = None,
    ts_format: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Map Canal flat-message JSON envelopes to the engine's
    change-event columns.

    One envelope may carry many rows (``data`` is an array); the
    adapter explodes it, then casts each all-string field back to
    ``row_schema``: timestamps via ``ts_format`` (Canal's JDBC-style
    rendering), binary via base64, numerics via plain cast. ``es``
    (source event time, epoch millis) becomes ``warc_ts``.
    """
    p = F.from_json(F.col(value_col), canal_envelope_schema(row_schema))
    carry = [F.col(batch_col)] if batch_col is not None else []
    exploded = envelopes.select(
        p.getField("type").alias("_type"),
        p.getField("es").alias("_es"),
        F.explode(p.getField("data")).alias("_row"),
        *carry,
    )
    is_delete = F.lower(F.col("_type")) == "delete"
    image = F.col("_row")
    key_type = next(f.dataType for f in row_schema.fields if f.name == key)
    cols = [
        image.getField(key).cast(key_type).alias(key),
        F.timestamp_millis(F.col("_es")).alias("warc_ts"),
    ]
    for f in row_schema.fields:
        if f.name in (key, "warc_ts"):
            continue
        c = image.getField(f.name)
        if isinstance(f.dataType, T.BinaryType):
            c = F.unbase64(c)
        elif isinstance(f.dataType, T.TimestampType):
            c = F.to_timestamp(c, ts_format)
        elif not isinstance(f.dataType, T.StringType):
            c = c.cast(f.dataType)
        cols.append(
            F.when(is_delete, F.lit(None).cast(f.dataType)).otherwise(c).alias(f.name)
        )
    cols.append(F.when(is_delete, "delete").otherwise("update").alias("op"))
    if batch_col is not None:
        cols.append(F.col(batch_col))
    return exploded.select(*cols)
