"""robots.txt parsing and RFC 9309 longest-match filtering."""

from pyspark.sql import functions as F

from dbp_etl_spark.operators.crawl import parse_robots, robots_filter


def _rules(spark, txt, host="h"):
    robots = spark.createDataFrame([(host, txt)], "host string, robots_txt string")
    return parse_robots(robots)


def test_parse_robots_directives_comments_and_empty(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "allow: /private/ok\n"     # case-insensitive directive
        "# Disallow: /commented\n"
        "Disallow:\n"              # empty = allow-all, no rule
        "Crawl-delay: 10\n"
        "  Disallow:   /spaced  \n"
    )
    got = {(r["allow"], r["prefix"]) for r in _rules(spark, txt).collect()}
    assert got == {
        (False, "/private"),
        (True, "/private/ok"),
        (False, "/spaced"),
    }


def test_robots_filter_longest_match_and_allow_tie(spark):
    txt = "Disallow: /a\nAllow: /a/b\nDisallow: /a/b/c\nAllow: /same\nDisallow: /same\n"
    rules = _rules(spark, txt)
    urls = spark.createDataFrame(
        [
            (1, "h", "/a/x"),        # /a disallow
            (2, "h", "/a/b/x"),      # /a/b allow beats /a
            (3, "h", "/a/b/c/x"),    # /a/b/c disallow beats /a/b
            (4, "h", "/free"),       # no rule -> allowed
            (5, "h", "/same/x"),     # equal length: allow wins
            (6, "other", "/a/x"),    # other host has no rules
        ],
        "id int, host string, path string",
    )
    got = {
        r["id"]: (r["allowed"], r["matched_prefix"])
        for r in robots_filter(urls, rules).collect()
    }
    assert got[1] == (False, "/a")
    assert got[2] == (True, "/a/b")
    assert got[3] == (False, "/a/b/c")
    assert got[4] == (True, None)
    assert got[5] == (True, "/same")
    assert got[6] == (True, None)


def test_robots_filter_broadcasts_rules(spark):
    from dbp_etl_spark.plans import assert_broadcast_join

    rules = _rules(spark, "Disallow: /x\n")
    # host must be a real column: a literal host constant-folds the
    # equi-key away and degrades the join to a nested loop
    urls = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string")).alias("host"),
        F.concat(F.lit("/p"), F.col("id")).alias("path"),
    )
    out = robots_filter(urls, rules)
    assert_broadcast_join(out)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "NestedLoop" not in p


# ------------------------------------------------- frontier scheduling


def test_frontier_schedule_slots_offsets_and_budget(spark):
    from dbp_etl_spark.operators.crawl import frontier_schedule

    rows = [
        ("a", "u1", 5.0, 2),
        ("a", "u2", 9.0, 2),
        ("a", "u3", 9.0, 2),   # priority tie -> url asc: u2 before u3
        ("b", "u4", 1.0, 7),
    ]
    f = spark.createDataFrame(
        rows, "host string, url string, priority double, crawl_delay_sec long"
    )
    got = {
        r["url"]: (r["fetch_slot"], r["fetch_offset_sec"])
        for r in frontier_schedule(f).collect()
    }
    assert got == {"u2": (1, 0), "u3": (2, 2), "u1": (3, 4), "u4": (1, 0)}
    # budget prunes past the first N slots per host
    kept = {r["url"] for r in frontier_schedule(f, budget=2).collect()}
    assert kept == {"u2", "u3", "u4"}


def test_frontier_schedule_single_window_shuffle(spark):
    from dbp_etl_spark.operators.crawl import frontier_schedule

    f = spark.createDataFrame(
        [("a", "u", 1.0, 1)], "host string, url string, priority double, crawl_delay_sec long"
    )
    plan = frontier_schedule(f)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1 and "Python" not in plan


# ------------------------------------------------- anchor-text pairs


def test_anchor_text_pairs_extracts_aligned_pairs(spark):
    from dbp_etl_spark.operators.crawl import anchor_text_pairs

    html = (
        '<html><a href="https://x.test/1">one link</a>'
        '<p>noise</p><a class="c" href="http://y.test/2">two</a>'
        "<a>no href</a></html>"
    )
    pages = spark.createDataFrame([(7, html), (8, "<html>none</html>")], "page_id long, html string")
    got = sorted(map(tuple, anchor_text_pairs(pages).select("page_id", "href", "anchor").collect()))
    assert got == [(7, "http://y.test/2", "two"), (7, "https://x.test/1", "one link")]


def test_anchor_text_pairs_is_map_only(spark):
    from dbp_etl_spark.operators.crawl import anchor_text_pairs

    pages = spark.createDataFrame([(1, "<a href=\"u\">t</a>")], "page_id long, html string")
    plan = anchor_text_pairs(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_parse_sitemap_entries_and_optionals(spark):
    from dbp_etl_spark.operators.crawl import parse_sitemap

    xml = (
        "<urlset><url><loc>https://a.com/p1</loc><lastmod>2026-01-05</lastmod>"
        "<changefreq>daily</changefreq><priority>0.8</priority></url>"
        "<url><loc> https://a.com/q1 </loc></url>"
        "<sitemap><loc>https://a.com/sm2.xml</loc></sitemap></urlset>"
    )
    df = spark.createDataFrame([("a.com", xml)], "host string, sitemap_xml string")
    got = sorted(map(tuple, parse_sitemap(df).collect()))
    assert got == [
        ("a.com", "sitemap", "https://a.com/sm2.xml", None, None, None),
        ("a.com", "url", "https://a.com/p1", "2026-01-05", "daily", 0.8),
        ("a.com", "url", "https://a.com/q1", None, None, None),
    ]


def test_parse_sitemap_skips_unclosed_and_null_priority(spark):
    from dbp_etl_spark.operators.crawl import parse_sitemap

    xml = (
        "<urlset><url><loc>https://a.com/open</loc>"  # never closed -> skipped
        "<url><loc>https://a.com/ok</loc><priority>high</priority></url></urlset>"
    )
    df = spark.createDataFrame([("a.com", xml)], "host string, sitemap_xml string")
    got = [tuple(r) for r in parse_sitemap(df).collect()]
    # an unclosed entry's window runs to the NEXT closing tag, merging
    # with the following entry: one row, first <loc> wins, and the
    # malformed priority try_casts to NULL instead of killing the scan
    assert len(got) == 1
    assert got[0][2] == "https://a.com/open" and got[0][5] is None


def test_parse_sitemap_is_map_only(spark):
    from dbp_etl_spark.operators.crawl import parse_sitemap

    df = spark.createDataFrame([("h", "<url><loc>u</loc></url>")], "host string, sitemap_xml string")
    plan = parse_sitemap(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# ------------------------------------------------------- template mining


def _tmpl_rows(spark, rows, **kw):
    from dbp_etl_spark.operators.crawl import mine_url_templates

    df = spark.createDataFrame(rows, "url string, content string")
    return {
        (r["host"], r["template"]): r
        for r in mine_url_templates(df, "url", "content", **kw).collect()
    }


def test_template_masking_and_trap_flag(spark):
    rows = [(f"https://a.com/cal/2026/{i}", "same page") for i in range(25)]
    rows += [(f"https://a.com/post/{i}", f"body {i}") for i in range(3)]
    rows += [("https://b.org/s/0123456789abcdef", "s1"),
             ("https://b.org/s/fedcba9876543210", "s2")]
    got = _tmpl_rows(spark, rows, min_urls=20, max_diversity=0.1)
    trap = got[("a.com", "/cal/N/N")]
    assert trap["n_urls"] == 25 and trap["n_content"] == 1 and trap["is_trap"]
    posts = got[("a.com", "/post/N")]
    assert posts["n_urls"] == 3 and not posts["is_trap"]
    hexes = got[("b.org", "/s/H")]
    assert hexes["n_urls"] == 2 and hexes["n_content"] == 2 and not hexes["is_trap"]


def test_template_query_string_masked(spark):
    rows = [(f"https://a.com/p?page={i}", f"c{i}") for i in range(4)]
    got = _tmpl_rows(spark, rows)
    assert set(got) == {("a.com", "/p?Q")}
    assert got[("a.com", "/p?Q")]["n_urls"] == 4


def test_template_no_content_column(spark):
    from dbp_etl_spark.operators.crawl import mine_url_templates

    df = spark.createDataFrame(
        [(f"https://a.com/x/{i}",) for i in range(30)], "url string"
    )
    r = mine_url_templates(df, "url").collect()[0]
    assert r["n_urls"] == 30 and r["n_content"] is None and not r["is_trap"]


def test_template_approx_mode_close(spark):
    from dbp_etl_spark.operators.crawl import mine_url_templates

    rows = [(f"https://a.com/cal/{i}", "same") for i in range(200)]
    df = spark.createDataFrame(rows, "url string, content string")
    r = mine_url_templates(df, "url", "content", exact=False).collect()[0]
    assert abs(r["n_urls"] - 200) <= 20 and r["is_trap"]


def test_template_mining_plan_map_only_derivation(spark):
    from dbp_etl_spark.operators.crawl import mine_url_templates

    df = spark.createDataFrame([("https://a.com/1", "c")], "url string, content string")
    plan = (
        mine_url_templates(df, "url", "content", exact=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # approx mode: single agg exchange, no count-distinct expand, no UDF
    assert plan.count("Exchange") <= 1 and "Expand" not in plan
    assert "Python" not in plan


# -------------------------------------------------------- crawl-delay


def test_parse_crawl_delay_variants(spark):
    from dbp_etl_spark.operators.crawl import parse_crawl_delay

    rows = [
        ("a", "User-agent: *\nCrawl-delay: 5\nDisallow: /x"),
        ("b", "crawl-DELAY:  2.5 \n# c"),            # case + fraction -> ceil 3
        ("c", "Crawl-delay: nonsense\nAllow: /"),     # unparseable -> default
        ("d", "Disallow: /"),                         # absent -> default
        ("e", "Crawl-delay: 1\nCrawl-delay: 9"),      # duplicates -> max
        ("f", "Crawl-delay: -4"),                     # negative -> default
    ]
    df = spark.createDataFrame(rows, "host string, robots_txt string")
    got = {r["host"]: r["crawl_delay_sec"] for r in parse_crawl_delay(df).collect()}
    assert got == {"a": 5, "b": 3, "c": 1, "d": 1, "e": 9, "f": 1}
