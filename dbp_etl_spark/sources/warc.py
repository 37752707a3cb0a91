"""WARC container source: Common-Crawl's native archive format.

A WARC file is a sequence of records, each framed by WARC/1.x headers
and a Content-Length; Common Crawl ships them gzip-compressed with ONE
GZIP MEMBER PER RECORD (so readers can split on member boundaries).
``read_warc`` turns a directory of ``.warc`` / ``.warc.gz`` files into
the engine's change-event rows:

    url      <- WARC-Target-URI of each response record
    warc_ts  <- WARC-Date (the crawl timestamp — the same event-time
                field the whole engine orders by; this is where the
                column's name comes from)
    html     <- the HTTP response body (headers stripped)
    op       <- 'update' (a crawl observation is an upsert)

so ``CDCRunner.run(read_warc(...))`` ingests raw crawl archives
directly. Parsing runs as an Arrow-batched ``mapInPandas`` over
``binaryFile`` rows — one task per archive file, the same unit
Common-Crawl processing uses; at 100 TB the parallelism is the file
count (CC ships ~1 GB segments, tens of thousands per crawl), and no
shuffle happens until the CDC merge itself.

Non-response records (warcinfo, request, metadata) are skipped.
Malformed records raise ValueError per-file; pass ``lenient=True`` to
skip a corrupt tail instead (the dead-letter philosophy: loud by
default, recoverable by choice).

Reference analog: the reference ingests pre-split per-file payloads
from a bucket listing (/root/reference/load/InputFileset.py) — WARC is
the upstream container those payloads come from.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("op", T.StringType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress ALL gzip members (CC uses one member per record)."""
    out = io.BytesIO()
    rest = data
    while rest:
        d = zlib.decompressobj(31)
        out.write(d.decompress(rest))
        out.write(d.flush())
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        rest = d.unused_data
    return out.getvalue()


def parse_warc(data: bytes, lenient: bool = False):
    """WARC bytes -> yield (url, datetime, body_bytes) per response
    record. Accepts plain or gzip (multi-member) input."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip the inter-record CRLF CRLF separators
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            if lenient:
                return
            raise ValueError(f"expected WARC record header at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            if lenient:
                return
            raise ValueError("truncated WARC header block")
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(b"\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            if lenient:
                return
            raise ValueError("WARC record missing Content-Length") from None
        body_start = hdr_end + 4
        body = data[body_start : body_start + clen]
        if len(body) < clen:
            if lenient:
                return
            raise ValueError("truncated WARC record body")
        pos = body_start + clen
        if headers.get("warc-type") != "response":
            continue
        uri = headers.get("warc-target-uri")
        date = headers.get("warc-date")
        if not uri or not date:
            if lenient:
                continue
            raise ValueError("response record missing Target-URI/Date")
        ts = datetime.fromisoformat(date.replace("Z", "+00:00")).astimezone(timezone.utc)
        # payload is an HTTP response: strip the status line + headers
        sep = body.find(b"\r\n\r\n")
        payload = body[sep + 4 :] if sep >= 0 else body
        yield uri, ts, payload


def read_warc(
    spark: SparkSession,
    path: str,
    lenient: bool = False,
    glob: str = "*.warc*",
) -> DataFrame:
    """Directory of WARC archives -> change-event DataFrame
    (url, warc_ts, html, op='update'). One parse task per file."""
    import pandas as pd

    files = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "op": []}
            for content in pdf["content"]:
                for uri, ts, payload in parse_warc(bytes(content), lenient=lenient):
                    rows["url"].append(uri)
                    rows["warc_ts"].append(ts)
                    rows["html"].append(payload)
                    rows["op"].append("update")
            yield pd.DataFrame(rows)

    return files.select("content").mapInPandas(op, schema=WARC_EVENT_SCHEMA)


# ------------------------------------------------------------- synthesis


def encode_warc(
    records: list[tuple[str, datetime, bytes]],
    gzip_per_record: bool = False,
    with_warcinfo: bool = True,
) -> bytes:
    """Test/synthesis writer: (url, ts, body) -> WARC bytes in the
    Common-Crawl shape (HTTP response payloads; optional one-gzip-
    member-per-record compression)."""
    import gzip as _gzip

    def rec(headers: list[tuple[str, str]], body: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode("latin-1") for k, v in headers
        )
        return head + b"\r\n" + body + b"\r\n\r\n"

    out = []
    if with_warcinfo:
        info = b"software: dbp-etl-spark test writer\r\n"
        out.append(
            rec(
                [
                    ("WARC-Type", "warcinfo"),
                    ("WARC-Date", "2024-01-01T00:00:00Z"),
                    ("Content-Type", "application/warc-fields"),
                    ("Content-Length", str(len(info))),
                ],
                info,
            )
        )
    for i, (url, ts, body) in enumerate(records):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
            + str(len(body)).encode()
            + b"\r\n\r\n"
            + body
        )
        out.append(
            rec(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", f"<urn:uuid:test-{i}>"),
                    ("WARC-Date", ts.strftime("%Y-%m-%dT%H:%M:%SZ")),
                    ("WARC-Target-URI", url),
                    ("Content-Type", "application/http; msgtype=response"),
                    ("Content-Length", str(len(http))),
                ],
                http,
            )
        )
    if gzip_per_record:
        return b"".join(_gzip.compress(r) for r in out)
    return b"".join(out)


# ------------------------------------------------------------- CDX index


def iter_warc_spans(data: bytes):
    """Yield (unit_bytes, offset, length) per independently-fetchable
    unit of a WARC archive: the COMPRESSED byte span of each gzip
    member (Common Crawl's one-record-per-member shape — exactly what
    CDX offsets address), or the record's own byte span in a plain
    archive. ``unit_bytes`` is decompressed."""
    if data[:2] == b"\x1f\x8b":
        pos = 0
        while pos < len(data):
            d = zlib.decompressobj(31)
            unit = d.decompress(data[pos:]) + d.flush()
            if not d.eof:
                raise ValueError("truncated gzip member in WARC")
            consumed = (len(data) - pos) - len(d.unused_data)
            yield unit, pos, consumed
            pos += consumed
        return
    pos = 0
    n = len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        start = pos
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0 or not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC record at offset {pos}")
        clen = None
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                clen = int(v.strip())
        if clen is None:
            raise ValueError("WARC record missing Content-Length")
        end = hdr_end + 4 + clen + 4  # body + trailing CRLFCRLF
        yield data[start:min(end, n)], start, min(end, n) - start
        pos = end


def build_warc_index(
    spark: SparkSession, path: str, glob: str = "*.warc*"
) -> DataFrame:
    """CDX-style index over a directory of archives: one row per
    response record with (url, warc_ts, filename, offset, length,
    sha1) where offset/length address the record's fetchable span —
    the compressed gzip member for CC-shaped archives. This is the
    crawl-native form of the reference's sidecar metadata + selective
    download (SURVEY S3): consumers re-fetch ONE record with a ranged
    read instead of rescanning the archive. Digest is hex SHA-1 of the
    HTTP payload (CC's CDX uses base32 of the same hash)."""
    import hashlib

    import pandas as pd

    files = spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {
                "url": [], "warc_ts": [], "filename": [],
                "offset": [], "length": [], "sha1": [],
            }
            for fname, content in zip(pdf["path"], pdf["content"]):
                for unit, off, ln in iter_warc_spans(bytes(content)):
                    for uri, ts, payload in parse_warc(unit):
                        rows["url"].append(uri)
                        rows["warc_ts"].append(ts)
                        rows["filename"].append(fname)
                        rows["offset"].append(off)
                        rows["length"].append(ln)
                        rows["sha1"].append(hashlib.sha1(payload).hexdigest())
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("filename", T.StringType()),
            T.StructField("offset", T.LongType()),
            T.StructField("length", T.LongType()),
            T.StructField("sha1", T.StringType()),
        ]
    )
    return files.select("path", "content").mapInPandas(op, schema=schema)


def fetch_warc_record(archive_bytes: bytes, offset: int, length: int):
    """Selective fetch: decode exactly one indexed record from its
    (offset, length) span — the slice a ranged GET would return."""
    unit = archive_bytes[offset : offset + length]
    if unit[:2] == b"\x1f\x8b":
        unit = _gunzip_members(unit)
    recs = list(parse_warc(unit))
    if len(recs) != 1:
        raise ValueError(f"span does not hold exactly one response record ({len(recs)})")
    return recs[0]
