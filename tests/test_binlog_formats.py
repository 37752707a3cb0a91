"""Maxwell / Canal envelope adapters: same tail, different wire formats.

The three adapters (Debezium, Maxwell, Canal) must be interchangeable:
the same logical change sequence rendered in each format must produce
identical engine change events and identical final table state.
"""

import base64
import json

from pyspark.sql import functions as F

from dbp_etl_spark.cdc import CDCRunner
from dbp_etl_spark.sources import from_canal, from_debezium, from_maxwell

from test_merge import PAGES, mk_table

ROW = PAGES  # url, warc_ts, html, text, lang


def b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


def maxwell_env(typ, ts_sec, image, batch=0):
    return (
        json.dumps(
            {"database": "db", "table": "pages", "type": typ, "ts": ts_sec, "data": image}
        ),
        batch,
    )


def canal_env(typ, es_ms, images, batch=0):
    return (
        json.dumps(
            {
                "database": "db",
                "table": "pages",
                "type": typ,
                "es": es_ms,
                "data": images,
                "old": None,
            }
        ),
        batch,
    )


def dbz_env(op, ts_ms, image, batch=0):
    body = {"op": op, "ts_ms": ts_ms, "before": None, "after": None}
    body["before" if op == "d" else "after"] = image
    return (json.dumps({"payload": body}), batch)


# One logical change sequence, rendered per format. Maxwell deletes
# carry the deleted image in `data`; Debezium deletes in `before`.
IMG1 = {"url": "u1", "html": b64(b"<p>one</p>"), "text": "one", "lang": "en"}
IMG1B = {"url": "u1", "html": b64(b"<p>one-v2</p>"), "text": "one v2", "lang": "en"}
IMG2 = {"url": "u2", "html": b64(b"<p>two</p>"), "text": "two", "lang": "de"}


def _state(table):
    return {
        r["url"]: (bytes(r["html"]), r["warc_ts"].timestamp(), r["text"], r["lang"])
        for r in table.read().collect()
    }


def test_maxwell_tail_matches_debezium_tail(spark, tmp_path):
    mx = [
        maxwell_env("insert", 100, IMG1, 0),
        maxwell_env("bootstrap-insert", 100, IMG2, 0),
        maxwell_env("update", 200, IMG1B, 1),
        maxwell_env("delete", 200, IMG2, 1),  # deleted image rides in data
        ("{not json", 1),  # malformed -> dead letter, tail survives
    ]
    dz = [
        dbz_env("c", 100_000, IMG1, 0),
        dbz_env("r", 100_000, IMG2, 0),
        dbz_env("u", 200_000, IMG1B, 1),
        dbz_env("d", 200_000, {"url": "u2"}, 1),
        ("{not json", 1),
    ]
    mx_df = spark.createDataFrame(mx, "value string, batch_id long")
    dz_df = spark.createDataFrame(dz, "value string, batch_id long")

    t_mx = mk_table(spark, tmp_path / "mx")
    t_dz = mk_table(spark, tmp_path / "dz")
    rep = CDCRunner(t_mx).run(from_maxwell(mx_df, ROW, batch_col="batch_id"))
    CDCRunner(t_dz).run(from_debezium(dz_df, ROW, batch_col="batch_id"))

    assert _state(t_mx) == _state(t_dz)
    assert _state(t_mx)["u1"][0] == b"<p>one-v2</p>" and "u2" not in _state(t_mx)
    dead = [
        r
        for res in rep.results
        if res.deadletter is not None
        for r in res.deadletter.collect()
    ]
    assert any(r["_dl_reason"] == "null_url" for r in dead)


def test_maxwell_delete_nulls_payload_but_keeps_key(spark):
    df = spark.createDataFrame(
        [maxwell_env("delete", 200, IMG2)], "value string, batch_id long"
    )
    row = from_maxwell(df, ROW).collect()[0]
    assert row["url"] == "u2" and row["op"] == "delete"
    assert row["html"] is None and row["text"] is None and row["lang"] is None
    assert row["warc_ts"].timestamp() == 200.0


def test_canal_multirow_envelope_explodes_and_casts(spark, tmp_path):
    # Canal flat messages carry arrays of all-string row images.
    envs = [
        canal_env("INSERT", 100_000, [IMG1, IMG2], 0),  # two rows, one envelope
        canal_env("UPDATE", 200_000, [IMG1B], 1),
        canal_env("DELETE", 200_000, [IMG2], 1),
    ]
    df = spark.createDataFrame(envs, "value string, batch_id long")
    changes = from_canal(df, ROW, batch_col="batch_id")
    assert changes.count() == 4  # exploded

    t = mk_table(spark, tmp_path)
    CDCRunner(t).run(changes)
    st = _state(t)
    # the runner re-derives text/lang from html; assert the raw columns
    assert set(st) == {"u1"}
    assert st["u1"][0] == b"<p>one-v2</p>" and st["u1"][1] == 200.0


def test_canal_numeric_and_timestamp_casts(spark):
    """Canal renders every value as a string; the adapter must cast
    back to the engine schema (timestamps via the JDBC rendering)."""
    from pyspark.sql import types as T

    row_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("hits", T.LongType()),
            T.StructField("seen", T.TimestampType()),
        ]
    )
    env = canal_env(
        "INSERT",
        100_000,
        [{"url": "u1", "score": "3.5", "hits": "42", "seen": "2024-01-02 03:04:05"}],
    )
    df = spark.createDataFrame([env], "value string, batch_id long")
    row = from_canal(df, row_schema).collect()[0]
    assert row["score"] == 3.5 and row["hits"] == 42
    assert row["seen"].strftime("%Y-%m-%d %H:%M:%S") == "2024-01-02 03:04:05"
    assert row["warc_ts"].timestamp() == 100.0


def test_canal_malformed_envelope_dead_letters(spark, tmp_path):
    envs = [canal_env("INSERT", 100_000, [IMG1], 0), ("<xml>nope</xml>", 0)]
    df = spark.createDataFrame(envs, "value string, batch_id long")
    changes = from_canal(df, ROW, batch_col="batch_id")
    # Malformed JSON -> from_json yields NULL struct -> explode drops it;
    # the well-formed row still lands.
    t = mk_table(spark, tmp_path)
    CDCRunner(t).run(changes)
    assert set(_state(t)) == {"u1"}


def test_three_formats_identical_change_events(spark):
    """Column-for-column parity of the three adapters on one upsert."""
    mx = spark.createDataFrame(
        [maxwell_env("update", 100, IMG1)], "value string, batch_id long"
    )
    cn = spark.createDataFrame(
        [canal_env("UPDATE", 100_000, [IMG1])], "value string, batch_id long"
    )
    dz = spark.createDataFrame(
        [dbz_env("u", 100_000, IMG1)], "value string, batch_id long"
    )
    cols = ["url", "warc_ts", "html", "text", "lang", "op"]
    a = from_maxwell(mx, ROW).select(cols).collect()
    b = from_canal(cn, ROW).select(cols).collect()
    c = from_debezium(dz, ROW).select(cols).collect()
    assert a == b == c
