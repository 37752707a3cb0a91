"""DBLog chunked-bootstrap semantics (cdc/dblog.py).

The property under test is the one the watermark rule exists for:
whatever position inside its watermark window a chunk's source read
happened at, the bootstrap converges to the plain latest-wins replay
state. Plus the ledger properties the runner composition buys:
replaying the whole schedule no-ops, and a bootstrap killed between
chunks resumes to the same state.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.cdc import CDCRunner
from dbp_etl_spark.cdc.dblog import (
    ChunkSpec,
    chunk_predicate,
    chunked_bootstrap,
    plan_chunks,
    supersede_chunk,
)
from dbp_etl_spark.lake import LakeTable, TableSchema

ROW_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _ts(s: str):
    import datetime

    return datetime.datetime.fromisoformat(s)


def _mk_rows(spark, rows):
    """rows: (url, ts_iso, payload, val, op[, batch])"""
    data = []
    for r in rows:
        url, ts, payload, val, op = r[:5]
        rec = {
            "url": url,
            "warc_ts": _ts(ts),
            "html": payload.encode(),
            "text": None,
            "lang": None,
            "val": float(val),
            "op": op,
        }
        if len(r) > 5:
            rec["batch_id"] = r[5]
        data.append(rec)
    schema = T.StructType(
        ROW_SCHEMA.fields + [T.StructField("op", T.StringType())]
        + ([T.StructField("batch_id", T.LongType())] if len(rows[0]) > 5 else [])
    )
    return spark.createDataFrame(data, schema)


# A 3-key scenario engineered so every watermark case occurs:
#   u1: write before window, nothing in window  -> chunk row survives
#   u2: write before window AND write inside it -> chunk superseded,
#       in-window event's batch is the authority
#   u3: delete inside the window                -> chunk superseded,
#       tombstone applies
#   u4: only appears in the tail after the window (insert)
TAIL = [
    ("u1", "2024-01-01 00:00:00", "a1", 1.0, "update", 0),
    ("u2", "2024-01-01 01:00:00", "b1", 2.0, "update", 0),
    ("u3", "2024-01-01 02:00:00", "c1", 3.0, "update", 0),
    ("u2", "2024-01-02 00:30:00", "b2", 2.5, "update", 1),
    ("u3", "2024-01-02 00:45:00", "c2", 0.0, "delete", 1),
    ("u4", "2024-01-03 00:00:00", "e1", 4.0, "update", 2),
]
LOW, HIGH = "2024-01-02 00:00:00", "2024-01-02 12:00:00"

# Final expected state: plain latest-wins over the tail plus the
# pre-existing source row u0 (never touched by the tail).
EXPECTED = {
    ("u0", "2023-12-01 00:00:00", b"s0", 9.0),
    ("u1", "2024-01-01 00:00:00", b"a1", 1.0),
    ("u2", "2024-01-02 00:30:00", b"b2", 2.5),
    ("u4", "2024-01-03 00:00:00", b"e1", 4.0),
}


def _source_at(spark, pos_iso: str):
    """Live source state at log position ``pos``: the pre-existing row
    plus every tail write <= pos, minus keys whose latest <= pos is a
    delete — what a SELECT against the source DB returns mid-window."""
    latest: dict = {"u0": ("2023-12-01 00:00:00", "s0", 9.0, "update")}
    for url, ts, payload, val, op, _b in TAIL:
        if ts <= pos_iso and (url not in latest or ts >= latest[url][0]):
            latest[url] = (ts, payload, val, op)
    rows = [
        (url, ts, payload, val, "insert")
        for url, (ts, payload, val, op) in sorted(latest.items())
        if op != "delete"
    ]
    return _mk_rows(spark, rows)


def _state(table):
    return {
        (r.url, r.warc_ts.strftime("%Y-%m-%d %H:%M:%S"), bytes(r.html), r.val)
        for r in table.read().select("url", "warc_ts", "html", "val").collect()
    }


def _bootstrap(spark, read_pos: str, root: str):
    table = LakeTable.create(
        spark, f"{root}/pages", TableSchema.from_struct(ROW_SCHEMA), key="url", num_buckets=4
    )
    runner = CDCRunner(table)
    tail = _mk_rows(spark, TAIL)
    chunks = [ChunkSpec(0, 1, _ts(LOW), _ts(HIGH), "chunk-0")]
    report = chunked_bootstrap(
        runner, lambda spec: _source_at(spark, read_pos), tail, chunks
    )
    return runner, report


@pytest.mark.parametrize(
    "read_pos",
    [
        "2024-01-02 00:00:00",  # read at the low watermark exactly
        "2024-01-02 00:40:00",  # read reflects u2's in-window write only
        "2024-01-02 00:50:00",  # read reflects u2's write AND u3's delete
        "2024-01-02 12:00:00",  # read at the high watermark exactly
    ],
)
def test_converges_for_any_read_position_in_window(spark, read_pos):
    """THE DBLog property: the chunk read may land anywhere inside its
    watermark window — racing writes/deletes reflected or not — and
    the bootstrap still converges to plain latest-wins replay."""
    with tempfile.TemporaryDirectory(prefix="dblog_t_") as root:
        runner, report = _bootstrap(spark, read_pos, root)
        assert _state(runner.table) == EXPECTED
        assert report.n_skipped == 0


def test_replay_noops_and_resume_converges(spark):
    """Chunks are ledger batches: a full replay of the schedule skips
    everything; a bootstrap killed after the first tail batch resumes
    through the same call and converges."""
    with tempfile.TemporaryDirectory(prefix="dblog_r_") as root:
        runner, first = _bootstrap(spark, "2024-01-02 00:40:00", root)
        before = _state(runner.table)
        # full replay: every tail batch and the chunk no-op via ledger
        tail = _mk_rows(spark, TAIL)
        chunks = [ChunkSpec(0, 1, _ts(LOW), _ts(HIGH), "chunk-0")]
        report = chunked_bootstrap(
            runner, lambda spec: _source_at(spark, "2024-01-02 00:40:00"), tail, chunks
        )
        assert report.n_skipped == report.n_batches > 0
        assert _state(runner.table) == before == EXPECTED


def test_partial_schedule_then_resume(spark):
    """Crash-resume: apply only tail batch 0 (no chunks), then re-run
    the FULL schedule on a fresh handle — committed work no-ops, the
    rest applies, final state identical to the uninterrupted run."""
    with tempfile.TemporaryDirectory(prefix="dblog_p_") as root:
        table = LakeTable.create(
            spark, f"{root}/pages", TableSchema.from_struct(ROW_SCHEMA), key="url", num_buckets=4
        )
        runner = CDCRunner(table)
        tail = _mk_rows(spark, TAIL)
        runner.run(tail.filter(F.col("batch_id") == 0))  # "crash" after batch 0
        resumed = CDCRunner(runner.table.refresh())
        chunks = [ChunkSpec(0, 1, _ts(LOW), _ts(HIGH), "chunk-0")]
        report = chunked_bootstrap(
            resumed, lambda spec: _source_at(spark, "2024-01-02 00:40:00"), tail, chunks
        )
        assert report.n_skipped == 1  # batch 0 ledger-skipped
        assert _state(resumed.table) == EXPECTED


def test_supersede_drops_exactly_window_keys(spark):
    """Unit check on the watermark rule itself."""
    tail = _mk_rows(spark, TAIL)
    chunk = _source_at(spark, "2024-01-02 00:40:00")
    spec = ChunkSpec(0, 1, _ts(LOW), _ts(HIGH), "chunk-0")
    out = supersede_chunk(chunk, tail, spec)
    kept = {r.url for r in out.select("url").collect()}
    # u2 (in-window write) and u3 (in-window delete) superseded;
    # u0/u1 survive; u4 not in the source at all
    assert kept == {"u0", "u1"}
    assert out.filter(F.col("op") != "insert").count() == 0


def test_chunk_predicate_partitions_key_space(spark):
    urls = spark.createDataFrame(
        [(f"https://h{i}.example/p",) for i in range(500)], ["url"]
    )
    n = 4
    total = 0
    for c in range(n):
        cnt = urls.filter(chunk_predicate("url", c, n)).count()
        assert cnt > 0  # hash ranges are non-degenerate
        total += cnt
    assert total == 500  # disjoint + exhaustive


def test_plan_chunks_spreads_evenly():
    chunks = plan_chunks(4, [0, 1, 2, 3, 4], lambda c: (f"lo{c}", f"hi{c}"))
    assert [c.after_batch for c in chunks] == [0, 1, 2, 3]
    assert [c.batch_id for c in chunks] == [f"chunk-{i:05d}" for i in range(4)]
    assert chunks[2].low_ts == "lo2" and chunks[2].high_ts == "hi2"
