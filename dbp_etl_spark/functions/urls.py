"""URL canonicalization and SURT keys — pure JVM expression trees.

A CDC pipeline keyed by ``url`` lives or dies on key hygiene: the same
page arrives as ``http://WWW.Example.com:80/a//b?utm_source=x&id=7#f``
and ``https://example.com/a/b?id=7``, and if those are two keys the
table double-counts the page, the MERGE misses the update, and the
near-dup pass wastes candidates. The reference keys rows on normalized
identifiers built by string cleanup (damId upcasing + suffix stripping,
/root/reference/load/InputFileset.py:61-83); this is the web analog.

Both operators are compositions of built-in ``pyspark.sql.functions``
— no UDF, whole-stage-codegen-able, shuffle-free (plan-pinned in
tests/test_plans.py), so they can run inline in the 10^10-event ingest
hot path at zero extra cost.

Canonicalization spec (each step a documented, reversible choice):
  1. trim; strip the fragment (``#...`` never reaches the server);
  2. lowercase scheme and host (RFC 3986 §6.2.2.1); the path stays
     case-sensitive;
  3. drop a leading ``www.`` host label (crawl-dedup convention —
     Common Crawl's SURT does the same);
  4. drop default ports ``:80`` (http) / ``:443`` (https);
  5. collapse duplicate slashes in the path; drop a trailing slash
     (except the bare root, which normalizes to no path);
  6. drop tracking params (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``, ``ref``), sort the survivors byte-wise (query-param
     order is non-semantic for idempotent GETs), drop an empty ``?``.

SURT (Sort-friendly URI Reordering Transform — the key format of
Common Crawl's CDX indexes and the Wayback Machine): reverse the host
labels so related hosts sort adjacently —
``https://maps.example.com/a?q=1`` → ``com,example,maps)/a?q=1``.
Range-partitioning or z-ordering the corpus by SURT key clusters a
domain's pages into the same files, so per-site scans, robots joins,
and host-level rollups become partition-pruned range reads instead of
full scans — that is the 100 TB reason this exists.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query params that never identify content
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def _split_parts(url: Column) -> tuple[Column, Column, Column, Column]:
    """(scheme, host[:port], path, query) via one anchored regex each —
    regexp_extract returns '' on no-match, which downstream steps treat
    as the natural empty value."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")  # 1. fragment off
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    return scheme, hostport, path, query


def canonicalize_url(url: Column) -> Column:
    """The full spec as one JVM expression tree."""
    scheme, hostport, path, query = _split_parts(url)
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when((scheme == F.lit("http")) & host.endswith(":80"), F.substring_index(host, ":", 1)) \
        .when((scheme == F.lit("https")) & host.endswith(":443"), F.substring_index(host, ":", 1)) \
        .otherwise(host)
    p = F.regexp_replace(path, r"/{2,}", "/")  # 5. collapse //
    p = F.regexp_replace(p, r"(.)/$", r"$1")  # 5. trailing slash (keep root)
    p = F.when(p == F.lit("/"), F.lit("")).otherwise(p)  # bare root -> empty
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
        )
    )
    q = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        p,
        F.when(q == F.lit(""), F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def surt_key(url: Column) -> Column:
    """Common-Crawl/Wayback SURT form of the CANONICAL url:
    ``com,example,maps)/path?query`` (scheme dropped — SURT keys are
    scheme-agnostic). Apply on top of :func:`canonicalize_url` output
    or any url; canonicalization is re-done here so the key is stable
    regardless of input form."""
    canon = canonicalize_url(url)
    hostport = F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://([^/?]*)", 1)
    rest = F.regexp_extract(canon, r"^[a-z][a-z0-9+.-]*://[^/?]*(.*)$", 1)
    # a non-default port survives canonicalization attached to the last
    # label; SURT keeps it AFTER the reversed host (com,example:8080)/),
    # so split it off before reversing
    port = F.regexp_extract(hostport, r"(:\d+)$", 1)
    host = F.regexp_replace(hostport, r":\d+$", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(
        rev, port, F.lit(")"), F.when(rest == "", F.lit("/")).otherwise(rest)
    )


def etld_plus_one(df, suffix_df, host_col: str = "host", max_suffix_labels: int = 4):
    """Registrable domain (eTLD+1) per row via a public-suffix list —
    the Mozilla-PSL longest-match algorithm, Spark-shaped.

    Host grouping by naive "last two labels" is wrong on half the web
    (``a.co.uk`` would collapse with ``b.co.uk`` under ``co.uk``'s
    sibling ``x.co.uk`` — correct — but ``foo.com.au``/``bar.com.au``
    would merge as ``com.au``); per-site rollups, politeness budgets
    and dedup scopes all key on the REGISTRABLE domain. Rule: the
    public suffix is the LONGEST suffix of the host present in the
    list; eTLD+1 = one more label in front of it. A host that IS a
    public suffix has no registrable domain (NULL); an unknown TLD
    falls back to the PSL's implicit ``*`` rule (last label is the
    suffix, so eTLD+1 = last two labels).

    Scale shape: the PSL (~9k rows real-world) is collapsed to ONE row
    holding a set column and broadcast — the join is a 1-row
    BroadcastNestedLoopJoin, the suffix candidates (at most
    ``max_suffix_labels`` per host) are generated and matched INSIDE
    the row with transform/filter against the broadcast set, and the
    set column is projected away immediately. Zero shuffles, zero
    explode: a map-only pass even at 10^10 rows.

    Adds column ``etld1`` to ``df``.
    """
    psl = F.broadcast(suffix_df.agg(F.collect_set("suffix").alias("_psl")))
    labels = F.split(F.col(host_col), r"\.")
    k = F.size(labels)
    cands = F.when(
        k >= 2,
        F.transform(
            F.sequence(F.lit(1), F.least(k - 1, F.lit(max_suffix_labels))),
            lambda j: F.array_join(F.slice(labels, k - j + 1, j), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))
    matched = F.filter(cands, lambda c: F.array_contains(F.col("_psl"), c))
    longest = F.element_at(matched, -1)  # candidates ascend by label count
    j_len = F.size(F.split(longest, r"\."))
    etld1 = (
        F.when(F.array_contains(F.col("_psl"), F.col(host_col)), F.lit(None))
        .when(
            F.size(matched) > 0,
            F.concat_ws(".", F.element_at(labels, k - j_len), longest),
        )
        .when(k >= 2, F.array_join(F.slice(labels, k - 1, 2), "."))
        .otherwise(F.lit(None))
    )
    return df.join(psl).withColumn("etld1", etld1).drop("_psl")
