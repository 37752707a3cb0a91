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


def frontier_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    priority_cols: list | None = None,
    delay_col: str = "crawl_delay_sec",
    budget: int | None = None,
) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling.

    Within each host, URLs are ranked by ``priority_cols`` (default:
    descending ``priority``, then the URL itself for determinism) and
    assigned ``fetch_slot`` (1-based) and ``fetch_offset_sec`` =
    ``(fetch_slot - 1) * crawl_delay_sec`` — the earliest instant the
    URL may be fetched without violating the host's crawl delay.
    ``budget`` keeps only the first N slots per host (per-host crawl
    budget — the frontier-pruning knob of a recrawl pass).

    Scale: per-host serialization is inherent to politeness (a host's
    fetches form one queue by definition), so ONE window shuffle keyed
    by host is the minimal plan; per-host state is a rank counter, not
    a buffer. A hot host (10^7 queued URLs) makes one long partition,
    but its schedule is also 10^7 * delay seconds long — the budget cut
    is the real-world remedy and prunes before anything downstream.
    """
    if priority_cols is None:
        priority_cols = [F.col("priority").desc(), F.col("url").asc()]
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(*priority_cols)
    out = frontier.withColumn("fetch_slot", F.row_number().over(w))
    if budget is not None:
        out = out.where(F.col("fetch_slot") <= budget)
    return out.withColumn(
        "fetch_offset_sec",
        ((F.col("fetch_slot") - 1) * F.col(delay_col)).cast("long"),
    )


def anchor_text_pairs(
    pages: DataFrame,
    html_col: str = "html",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Extract (href, anchor_text) pairs from raw HTML — the anchor
    corpus behind target-side relevance signals (anchor-text search
    indexes, seed expansion, link-spam features).

    One JVM ``regexp_extract_all`` per capture group over the same
    pattern — the two arrays index the same match spans, so
    ``arrays_zip`` realigns them without a UDF — then one explode
    bounded by links-per-page. Map-only; no shuffle."""
    pat = F.lit(r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>')
    hrefs = F.regexp_extract_all(F.col(html_col), pat, 1)
    texts = F.regexp_extract_all(F.col(html_col), pat, 2)
    keep = keep_cols if keep_cols is not None else [c for c in pages.columns if c != html_col]
    pair = F.explode(F.arrays_zip(hrefs.alias("href"), texts.alias("anchor"))).alias("_p")
    return pages.select(*keep, pair).select(
        *keep, F.col("_p.href").alias("href"), F.col("_p.anchor").alias("anchor")
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


def parse_sitemap(df: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """Parse sitemap XML bodies (sitemaps.org protocol) into one row
    per entry: ``kind`` ('url' for ``<url>`` page entries, 'sitemap'
    for ``<sitemap>`` index entries pointing at child sitemaps),
    ``loc``, and the optional ``lastmod``/``changefreq``/``priority``
    (NULL when absent). All other input columns pass through.

    The discovery-side sibling of parse_robots: a recrawl scheduler
    joins these rows against the frontier to seed and re-prioritize
    fetches. One regexp explode bounded by entries-per-sitemap (the
    protocol caps a file at 50k URLs), then map-only field extracts —
    no shuffle, no Python.
    """
    entry = F.explode(
        F.regexp_extract_all(
            F.col(xml_col),
            F.lit(r"(?s)<(?:url|sitemap)>.*?</(?:url|sitemap)>"),
            0,
        )
    ).alias("_entry")
    passthrough = [c for c in df.columns if c != xml_col]

    def opt(tag: str):
        return F.nullif(
            F.regexp_extract(F.col("_entry"), rf"<{tag}>\s*(.*?)\s*</{tag}>", 1),
            F.lit(""),
        )

    return df.select(*passthrough, entry).select(
        *passthrough,
        F.regexp_extract(F.col("_entry"), r"^<(url|sitemap)>", 1).alias("kind"),
        opt("loc").alias("loc"),
        opt("lastmod").alias("lastmod"),
        opt("changefreq").alias("changefreq"),
        # try_cast: crawled sitemaps carry junk priorities; under ANSI
        # mode a plain cast would kill the whole scan on one bad entry
        opt("priority").try_cast("double").alias("priority"),
    )


def mine_url_templates(
    pages: DataFrame,
    url_col: str = "url",
    content_col: str | None = None,
    min_urls: int = 20,
    max_diversity: float = 0.1,
    exact: bool = True,
) -> DataFrame:
    """URL-template mining + crawler-trap detection.

    Collapses each URL to a (host, template) by masking volatile path
    material — hex ids of 8+ chars to ``H``, digit runs to ``N``, and
    the query string to ``?Q`` — then profiles each template:

        (host, template, n_urls, n_content, diversity, is_trap)

    ``n_urls`` counts distinct URLs under the template, ``n_content``
    distinct page bodies (when ``content_col`` is given; else NULL),
    ``diversity`` their ratio, and ``is_trap`` flags templates that
    enumerate many URLs over near-constant content
    (n_urls >= min_urls AND diversity <= max_diversity) — calendars,
    session-id echoes, faceted-search grids: the infinite URL spaces a
    frontier must prune before they eat the fetch budget. The
    reference ingests a curated bucket and never faces this; a
    Common-Crawl-scale recrawl does.

    Scale shape: template derivation is map-only JVM regexp (no UDF);
    the profile is ONE groupBy keyed by (host, template) — templates
    are the point: cardinality collapses from URL-count to
    template-count, so the shuffle is small by construction. With
    ``exact=False`` the two distinct counts become
    approx_count_distinct (HLL, single-pass, no count-distinct
    expand) — the 100 TB default; exact=True is the oracle-parity
    mode.
    """
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    masked = F.regexp_replace(
        F.regexp_replace(path, r"[0-9a-f]{8,}", "H"), r"[0-9]+", "N"
    )
    template = F.concat(
        masked,
        F.when(u.contains("?"), F.lit("?Q")).otherwise(F.lit("")),
    )
    keyed = pages.select(
        host.alias("host"),
        template.alias("template"),
        u.alias("_url"),
        *(
            [F.col(content_col).alias("_content")]
            if content_col is not None
            else []
        ),
    )
    cd = (F.countDistinct if exact else F.approx_count_distinct)
    aggs = [cd("_url").cast("bigint").alias("n_urls")]
    if content_col is not None:
        aggs.append(cd("_content").cast("bigint").alias("n_content"))
    prof = keyed.groupBy("host", "template").agg(*aggs)
    if content_col is None:
        prof = prof.withColumn("n_content", F.lit(None).cast("bigint"))
    diversity = (F.col("n_content") / F.col("n_urls")).cast("double")
    return prof.select(
        "host",
        "template",
        "n_urls",
        "n_content",
        diversity.alias("diversity"),
        (
            (F.col("n_urls") >= F.lit(min_urls))
            & F.coalesce(diversity <= F.lit(float(max_diversity)), F.lit(False))
        ).alias("is_trap"),
    )


def parse_crawl_delay(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    default_sec: int = 1,
) -> DataFrame:
    """Extract the global group's ``Crawl-delay:`` directive as
    (host, crawl_delay_sec). The directive is non-standard (absent
    from RFC 9309) but honored by major crawlers; multiple values per
    host collapse to the MAX (the conservative reading). Hosts whose
    robots.txt carries no parseable delay get ``default_sec``.
    Same shape as parse_robots: one explode, map-only, then a
    host-keyed max — feeds frontier_schedule's ``delay_col``."""
    line = F.explode(F.split(F.col(txt_col), "\n")).alias("line")
    d = robots.select(F.col(host_col).alias("host"), line)
    trimmed = F.trim(F.col("line"))
    directive = F.lower(F.regexp_extract(trimmed, r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(
        F.regexp_extract(trimmed, r"^[A-Za-z-]+\s*:\s*(\S+)", 1)
    ).try_cast("double")
    delays = d.select("host", directive.alias("directive"), value.alias("v")).where(
        (F.col("directive") == "crawl-delay") & F.col("v").isNotNull() & (F.col("v") >= 0)
    )
    hosts = robots.select(F.col(host_col).alias("host")).distinct()
    return hosts.join(
        delays.groupBy("host").agg(F.ceil(F.max("v")).cast("long").alias("crawl_delay_sec")),
        "host",
        "left",
    ).select(
        "host",
        F.coalesce(F.col("crawl_delay_sec"), F.lit(int(default_sec)).cast("long")).alias(
            "crawl_delay_sec"
        ),
    )
