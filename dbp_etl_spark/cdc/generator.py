"""Deterministic synthetic CDC event generator.

Pure ``spark.range`` + column arithmetic — no Python row loops, no RNG
state: every value is a function of the row id and the seed, so the
same (n_events, seed, knobs) always produces the identical dataset on
any partitioning/parallelism (needed for the two-parallelism scaling
bench and replay tests).

Fixture behaviors generated (per FIXTURES.md §2 / reference analogs):
* duplicate events per url within a batch with different warc_ts
  (dedup rule exercise, /root/reference/load/FilenameReducer.py:99-120);
* out-of-order warc_ts across batches (late-event guard);
* update/delete mix (explicit tombstones);
* a hot-url cluster (skew: `hot_fraction` of events hit `hot_urls` keys);
* optional malformed rows (dead-letter routing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_changes(
    spark: SparkSession,
    n_events: int,
    n_urls: int,
    n_batches: int = 4,
    update_pct: int = 30,
    delete_pct: int = 5,
    hot_fraction_pct: int = 20,
    hot_urls: int = 4,
    malformed_pct: int = 0,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Change-event stream: (url, warc_ts, html, op, batch_id)."""
    df = spark.range(0, n_events, numPartitions=partitions)
    rid = F.col("id")

    def h(salt: int):
        return F.abs(F.xxhash64(rid, F.lit(seed), F.lit(salt)))

    # key selection with explicit skew: hot_fraction_pct of events land
    # on one of `hot_urls` keys
    url_idx = F.when(
        h(1) % 100 < hot_fraction_pct, h(2) % F.lit(max(hot_urls, 1))
    ).otherwise(h(3) % F.lit(n_urls))
    url = F.concat(
        F.lit("https://host"),
        (url_idx % 97).cast("string"),
        F.lit(".example/p"),
        url_idx.cast("string"),
    )

    # event time: base + shuffled-by-prime offset -> out-of-order arrival
    ts_offset = (rid * 7919) % F.lit(max(n_events, 1))
    warc_ts = F.timestamp_seconds(F.lit(1700000000) + ts_offset)

    op = (
        F.when(h(4) % 100 < delete_pct, "delete")
        .when(h(4) % 100 < delete_pct + update_pct, "update")
        .otherwise("insert")
    )

    # deterministic html body; version tag varies with a second hash so
    # updates really change bytes; ~5% of updates repeat a prior version
    # (payload-unchanged no-op exercise)
    version = F.when(h(5) % 20 == 0, F.lit(0)).otherwise(h(5) % 1000)
    body = F.concat(
        F.lit("<html><head><title>"),
        url,
        F.lit("</title></head><body><h1>Page "),
        url_idx.cast("string"),
        F.lit("</h1><p>The quick brown fox jumps over the lazy dog "),
        version.cast("string"),
        F.lit(" of the content and the text is here.</p><script>var x=1;</script></body></html>"),
    )
    html = F.when(op == "delete", F.lit(None).cast("binary")).otherwise(
        F.encode(body, "utf-8")
    )

    # batches follow event order (microbatch tail)
    batch_id = (rid * F.lit(n_batches) / F.lit(max(n_events, 1))).cast("long")

    if malformed_pct:
        url = F.when(h(6) % 100 < malformed_pct, F.lit(None).cast("string")).otherwise(url)
    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        op.alias("op"),
        batch_id.alias("batch_id"),
    )
