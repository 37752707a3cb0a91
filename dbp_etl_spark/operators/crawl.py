"""Crawl-politeness operators: robots.txt parsing + longest-match
URL filtering (RFC 9309 semantics).

Reference analog: the reference pipeline trusts an upstream crawler
for fetch policy; a Common-Crawl-scale ingest has to re-derive
fetchability itself when re-crawling or filtering archives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_robots(robots: DataFrame, host_col: str = "host", txt_col: str = "robots_txt") -> DataFrame:
    """Parse robots.txt bodies into (host, allow, prefix) rule rows.

    Supports the global group's ``Allow:`` / ``Disallow:`` lines
    (case-insensitive directives, comments and blank prefixes
    dropped — an empty ``Disallow:`` means allow-all per RFC 9309
    §2.2.2 and produces no rule). One explode, map-only."""
    line = F.explode(F.split(F.col(txt_col), "\n")).alias("line")
    d = robots.select(F.col(host_col).alias("host"), line)
    trimmed = F.trim(F.col("line"))
    directive = F.lower(F.regexp_extract(trimmed, r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract(trimmed, r"^[A-Za-z-]+\s*:\s*(\S+)", 1))
    return (
        d.select(
            "host",
            directive.alias("directive"),
            value.alias("prefix"),
        )
        .where(F.col("directive").isin("allow", "disallow") & (F.col("prefix") != ""))
        .select("host", (F.col("directive") == "allow").alias("allow"), "prefix")
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """RFC 9309 longest-match fetchability: for each URL, the most
    specific (longest-prefix) matching rule of its host decides;
    allow wins prefix-length ties; no matching rule means allowed.

    Adds (matched_prefix, allowed). The rules side is per-host
    metadata — tiny next to a 10^10-URL corpus — so it broadcasts and
    the whole filter is a map-side broadcast join + one agg keyed by
    the URL row (no URL-side shuffle of anything but its own key).
    """
    r = rules.select(
        F.col("host").alias("_rh"), "allow", "prefix", F.length("prefix").alias("_plen")
    )
    joined = urls.join(
        F.broadcast(r),
        (F.col(host_col) == F.col("_rh"))
        & F.col(path_col).startswith(F.col("prefix")),
        "left",
    )
    key_cols = [F.col(c) for c in urls.columns]
    best = F.max(
        F.when(
            F.col("prefix").isNotNull(),
            F.struct(
                F.col("_plen").alias("l"),
                F.col("allow").cast("int").alias("a"),
                F.col("prefix").alias("p"),
            ),
        )
    ).alias("_best")
    out = joined.groupBy(*key_cols).agg(best)
    return out.select(
        *urls.columns,
        F.col("_best.p").alias("matched_prefix"),
        F.coalesce(F.col("_best.a") == 1, F.lit(True)).alias("allowed"),
    )
