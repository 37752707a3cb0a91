"""WARC container source (sources/warc.py): parse, ingest, dead ends."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.cdc import CDCRunner
from dbp_etl_spark.sources.warc import encode_warc, parse_warc, read_warc

from test_merge import mk_table

RECS = [
    ("https://a.example/1", datetime(2024, 1, 1, tzinfo=timezone.utc), b"<p>one</p>"),
    ("https://b.example/2", datetime(2024, 1, 2, tzinfo=timezone.utc), b"<p>two</p>"),
    # a recrawl of the first url with newer content
    ("https://a.example/1", datetime(2024, 1, 3, tzinfo=timezone.utc), b"<p>one-v2</p>"),
]


def test_parse_roundtrip_plain_and_gzip():
    for gz in (False, True):
        got = list(parse_warc(encode_warc(RECS, gzip_per_record=gz)))
        assert [(u, p) for u, _, p in got] == [(u, p) for u, _, p in RECS]
        assert got[0][1] == RECS[0][1]


def test_parse_skips_non_response_records():
    # warcinfo leads the file and request/metadata records are common
    data = encode_warc(RECS, with_warcinfo=True)
    assert len(list(parse_warc(data))) == 3


def test_truncated_raises_lenient_salvages():
    data = encode_warc(RECS)
    with pytest.raises(ValueError):
        list(parse_warc(data[: len(data) - 40]))
    head_plus = len(encode_warc(RECS[:1])) + 30
    assert len(list(parse_warc(data[:head_plus], lenient=True))) == 1


def test_read_warc_into_cdc_runner(spark, tmp_path):
    """Crawl archives tail straight into the table: two WARC files
    (one plain, one CC-style gzip-per-record), recrawl wins."""
    src = tmp_path / "warcs"
    src.mkdir()
    (src / "seg-0.warc").write_bytes(encode_warc(RECS[:2]))
    (src / "seg-1.warc.gz").write_bytes(encode_warc(RECS[2:], gzip_per_record=True))

    changes = read_warc(spark, str(src)).withColumn("batch_id", F.lit(0))
    t = mk_table(spark, tmp_path)
    CDCRunner(t).run(changes)
    s = {r["url"]: (bytes(r["html"]), r["warc_ts"].timestamp()) for r in t.read().collect()}
    assert s == {
        "https://a.example/1": (b"<p>one-v2</p>", RECS[2][1].timestamp()),
        "https://b.example/2": (b"<p>two</p>", RECS[1][1].timestamp()),
    }
    # text derived from the real payload by the standard transform
    texts = {r["url"]: r["text"] for r in t.read().collect()}
    assert texts["https://a.example/1"] == "one-v2"


def test_cdx_index_and_selective_fetch(spark, tmp_path):
    """build_warc_index rows address fetchable spans: slicing the
    archive at (offset, length) re-decodes exactly that record."""
    import hashlib

    from dbp_etl_spark.sources.warc import build_warc_index, fetch_warc_record

    src = tmp_path / "warcs"
    src.mkdir()
    (src / "seg-0.warc.gz").write_bytes(encode_warc(RECS, gzip_per_record=True))
    (src / "seg-1.warc").write_bytes(encode_warc(RECS[:1]))

    idx = {
        (r["url"], r["filename"].rsplit("/", 1)[-1]): r
        for r in build_warc_index(spark, str(src)).collect()
    }
    # 3 responses in the gz archive + 1 in the plain one
    assert len(idx) == 3 + 1 - 1  # (a.example/1 appears twice in seg-0; dict keyed by url+file keeps last)
    raw = (src / "seg-0.warc.gz").read_bytes()
    row = idx[("https://b.example/2", "seg-0.warc.gz")]
    url, ts, payload = fetch_warc_record(raw, row["offset"], row["length"])
    assert url == "https://b.example/2" and payload == b"<p>two</p>"
    assert hashlib.sha1(payload).hexdigest() == row["sha1"]

    raw1 = (src / "seg-1.warc").read_bytes()
    row1 = idx[("https://a.example/1", "seg-1.warc")]
    url1, _, payload1 = fetch_warc_record(raw1, row1["offset"], row1["length"])
    assert url1 == "https://a.example/1" and payload1 == b"<p>one</p>"
