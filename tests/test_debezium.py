"""Debezium-envelope adapter: WAL-shaped JSON in, engine change events out."""

import json

from pyspark.sql import functions as F

from dbp_etl_spark.cdc import CDCRunner
from dbp_etl_spark.lake import LakeTable, TableSchema
from dbp_etl_spark.sources import from_debezium

from test_merge import PAGES, mk_table


ROW = PAGES  # url, warc_ts, html, text, lang — the row image schema


def env(op, ts_ms, image, batch=0):
    body = {"op": op, "ts_ms": ts_ms, "before": None, "after": None}
    side = "before" if op == "d" else "after"
    body[side] = image
    return (json.dumps({"payload": body}), batch)


def b64(b: bytes) -> str:
    import base64

    return base64.b64encode(b).decode()


def test_debezium_tail_applies_like_native_events(spark, tmp_path):
    envelopes = [
        env("c", 100_000, {"url": "u1", "html": b64(b"<p>one</p>")}, 0),
        env("r", 100_000, {"url": "u2", "html": b64(b"<p>two</p>")}, 0),  # snapshot read
        env("u", 200_000, {"url": "u1", "html": b64(b"<p>one-v2</p>")}, 1),
        env("d", 200_000, {"url": "u2"}, 1),
        env("u", 150_000, {"url": "u1", "html": b64(b"<p>late</p>")}, 2),  # late
        ("{not json", 2),  # malformed envelope -> dead letter, tail survives
    ]
    df = spark.createDataFrame(envelopes, "value string, batch_id long")
    changes = from_debezium(df, ROW, batch_col="batch_id")

    t = mk_table(spark, tmp_path)
    report = CDCRunner(t).run(changes)
    s = {r["url"]: (bytes(r["html"]), r["warc_ts"].timestamp()) for r in t.read().collect()}
    assert s == {"u1": (b"<p>one-v2</p>", 200.0)}  # late lost, u2 tombstoned
    # malformed row was dead-lettered, not fatal
    dead = [r for res in report.results if res.deadletter is not None for r in res.deadletter.collect()]
    assert any(r["_dl_reason"] == "null_url" for r in dead)


def test_debezium_binary_roundtrip_exact(spark, tmp_path):
    payload = bytes(range(256))
    df = spark.createDataFrame(
        [env("c", 100_000, {"url": "u1", "html": b64(payload)})],
        "value string, batch_id long",
    )
    changes = from_debezium(df, ROW, batch_col="batch_id")
    got = changes.collect()[0]
    assert bytes(got["html"]) == payload
    assert got["op"] == "update" and got["warc_ts"].timestamp() == 100.0


def test_debezium_text_stream_tail(spark, tmp_path):
    """Streaming composition: a line-oriented Debezium feed tails into
    the table through run_stream(source_format='text') + the adapter —
    the file-based stand-in for a Kafka value stream."""
    from dbp_etl_spark.streaming import run_stream

    src = tmp_path / "dbz"
    src.mkdir()
    (src / "b0.jsonl").write_text(
        "\n".join(
            [
                env("c", 100_000, {"url": "u1", "html": b64(b"<p>one</p>")})[0],
                env("c", 100_000, {"url": "u2", "html": b64(b"<p>two</p>")})[0],
            ]
        )
    )
    (src / "b1.jsonl").write_text(
        "\n".join(
            [
                env("u", 200_000, {"url": "u1", "html": b64(b"<p>one-v2</p>")})[0],
                env("d", 200_000, {"url": "u2"})[0],
            ]
        )
    )
    t = mk_table(spark, tmp_path)
    q = run_stream(
        spark,
        str(src),
        t,
        checkpoint_path=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        source_format="text",
        source_adapter=lambda df: from_debezium(df, ROW),
    )
    q.awaitTermination(120)
    s = {r["url"]: bytes(r["html"]) for r in t.read().collect()}
    assert s == {"u1": b"<p>one-v2</p>"}
