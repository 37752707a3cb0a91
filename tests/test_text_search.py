"""Inverted-index text search: postings build, AND search, positional
phrase search (incl. repeated tokens), and the pushed-down plan."""

import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.operators.text_search import (
    build_postings,
    posting_lists,
    search_and,
    search_phrase,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick quick slow"),
    (2, "brown dog and brown fox"),
    (3, "nothing relevant here"),
    (4, "the the the"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_postings_shape(spark, docs):
    p = build_postings(docs)
    row = p.filter((F.col("token") == "quick") & (F.col("doc") == 1)).collect()[0]
    assert row["positions"] == [0, 1] and row["tf"] == 2
    lists = {r["token"]: r for r in posting_lists(p).collect()}
    assert lists["brown"]["df"] == 2
    assert [x["doc"] for x in lists["brown"]["postings"]] == [0, 2]


def test_search_and(spark, docs):
    p = build_postings(docs)
    got = {r["doc"]: r["total_tf"] for r in search_and(p, ["brown", "fox"]).collect()}
    assert got == {0: 2, 2: 3}  # doc2: brown x2 + fox x1
    assert search_and(p, ["slow", "dog"]).count() == 0  # never co-occur


def test_search_phrase_basic(spark, docs):
    p = build_postings(docs)
    got = {r["doc"]: r["n_matches"] for r in search_phrase(p, ["brown", "fox"]).collect()}
    assert got == {0: 1, 2: 1}
    # order matters: 'fox brown' appears nowhere
    assert search_phrase(p, ["fox", "brown"]).count() == 0


def test_search_phrase_repeated_token_and_overlap(spark, docs):
    p = build_postings(docs)
    # 'the the' in doc4 ('the the the') overlaps: starts 0 and 1
    got = {r["doc"]: r["n_matches"] for r in search_phrase(p, ["the", "the"]).collect()}
    assert got == {4: 2}
    got3 = {r["doc"]: r["n_matches"] for r in search_phrase(p, ["the", "the", "the"]).collect()}
    assert got3 == {4: 1}
    # 'quick quick' in doc1
    got_q = {r["doc"]: r["n_matches"] for r in search_phrase(p, ["quick", "quick"]).collect()}
    assert got_q == {1: 1}


def test_index_scan_pushes_token_filter(spark, docs, tmp_path):
    """Persisted index + query: the term filter reaches the parquet
    scan (PushedFilters In(token,...)), and the plan has no cartesian
    product — token-keyed work only."""
    idx_path = str(tmp_path / "postings")
    build_postings(docs).repartition("token").write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    plan = search_phrase(idx, ["brown", "fox"])._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "token" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # and the pruned scan still answers correctly
    got = {r["doc"]: r["n_matches"] for r in search_phrase(idx, ["brown", "fox"]).collect()}
    assert got == {0: 1, 2: 1}


def _bm25_expected(terms, k1=1.2, b=0.75):
    """Closed-form BM25 over DOCS computed in plain Python."""
    import math
    import re

    toks = {i: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t] for i, s in DOCS}
    dls = {i: len(ts) for i, ts in toks.items() if ts}
    n = len(dls)
    avgdl = sum(dls.values()) / n
    scores = {}
    for term in set(terms):
        hits = {i: ts.count(term) for i, ts in toks.items() if term in ts}
        if not hits:
            continue
        idf = math.log((n - len(hits) + 0.5) / (len(hits) + 0.5) + 1.0)
        for i, tf in hits.items():
            tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dls[i] / avgdl))
            scores[i] = scores.get(i, 0.0) + idf * tfn
    return {i: round(s, 4) for i, s in scores.items()}


def test_search_ranked_bm25_scores(spark, docs):
    from dbp_etl_spark.operators.text_search import search_ranked

    p = build_postings(docs)
    terms = ["brown", "quick", "absentterm"]
    got = search_ranked(p, terms, k=10).collect()
    want = _bm25_expected(terms)
    assert {r["doc"]: r["score"] for r in got} == pytest.approx(want, abs=1e-4)
    # OR semantics: docs matching ANY term rank; ranks are dense 1..n
    assert [r["rk"] for r in sorted(got, key=lambda r: -r["score"])] == list(
        range(1, len(want) + 1)
    )
    # rarer term outranks common one at equal tf: doc3 matches nothing
    assert 3 not in {r["doc"] for r in got}


def test_search_ranked_topk_and_ties(spark, docs):
    from dbp_etl_spark.operators.text_search import search_ranked

    p = build_postings(docs)
    got = search_ranked(p, ["brown", "quick"], k=2).collect()
    want = _bm25_expected(["brown", "quick"])
    top2 = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["doc"], r["score"], r["rk"]) for r in sorted(got, key=lambda r: r["rk"])] == [
        (d, pytest.approx(s, abs=1e-4), i + 1) for i, (d, s) in enumerate(top2)
    ]
    # all query terms absent: empty result, no crash
    assert search_ranked(p, ["nosuchtoken"], k=5).count() == 0


def test_search_ranked_pushes_term_filter(spark, docs, tmp_path):
    """Persisted index: the query terms reach the postings scan as
    PushedFilters (only those terms' rows are read) and the plan stays
    join-keyed — no cartesian, no full sort (top-k is TakeOrdered)."""
    from dbp_etl_spark.operators.text_search import doc_lengths, search_ranked

    idx_path = str(tmp_path / "postings")
    build_postings(docs).repartition("token").write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    dl = doc_lengths(idx)
    res = search_ranked(idx, ["brown", "quick"], k=3, doclens=dl)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "token" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not a global sort
    got = {r["doc"]: r["score"] for r in res.collect()}
    want = _bm25_expected(["brown", "quick"])
    top3 = dict(sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3])
    assert got == pytest.approx(top3, abs=1e-4)


def test_fuzzy_expand_and_search(spark):
    from dbp_etl_spark.operators.text_search import (
        build_postings,
        fuzzy_expand_terms,
        search_fuzzy_and,
    )

    docs = spark.createDataFrame(
        [
            (0, "spark table merge"),
            (1, "spars table window"),
            (2, "sparkle table"),
            (3, "quantum leap"),
        ],
        ["doc_id", "text"],
    )
    post = build_postings(docs)
    got = sorted(
        (r["qt"], r["token"]) for r in fuzzy_expand_terms(post, ["sparc"]).collect()
    )
    # distance 1: spark (sub), spars (sub); NOT sparkle (distance 3)
    assert got == [("sparc", "spark"), ("sparc", "spars")]

    hits = sorted(
        (r["doc"], r["total_tf"])
        for r in search_fuzzy_and(post, ["sparc", "tabl"]).collect()
    )
    # docs 0,1 have a sparc-match AND a tabl-match (table, dist 1);
    # doc 2's only sparc-neighbor candidate 'sparkle' fails the verify
    assert hits == [(0, 2), (1, 2)]


def test_fuzzy_neighborhood_rejects_distance_two(spark):
    from dbp_etl_spark.operators.text_search import build_postings, fuzzy_expand_terms

    # 'ab' vs 'ba': deletion neighborhoods intersect ({a,b}) but the
    # levenshtein verify rejects the transposition (distance 2)
    docs = spark.createDataFrame([(0, "ba xx")], ["doc_id", "text"])
    got = fuzzy_expand_terms(build_postings(docs), ["ab"]).collect()
    assert got == []


# ----------------------------------------------------------- gazetteer


def _gaz(spark, docs, phrases):
    from dbp_etl_spark.operators.text_search import gazetteer_match

    ddf = spark.createDataFrame(docs, "doc_id bigint, text string")
    pdf = spark.createDataFrame([(p,) for p in phrases], "phrase string")
    return {
        (r["doc_id"], r["phrase"]): (r["n_mentions"], r["first_idx"])
        for r in gazetteer_match(ddf, pdf).collect()
    }


def test_gazetteer_single_and_multiword(spark):
    got = _gaz(
        spark,
        [(1, "I left New York for New York City, then york again.")],
        ["new york", "new york city", "york"],
    )
    # tokens: i left new york for new york city then york again
    # "new york" matches at tokens 3 and 6; "new york city" once at 6;
    # bare "york" matches inside both bigrams plus the standalone -> 3
    assert got[(1, "new york")] == (2, 3)
    assert got[(1, "new york city")] == (1, 6)
    assert got[(1, "york")] == (3, 4)


def test_gazetteer_normalization_and_punctuation(spark):
    got = _gaz(spark, [(1, "Hello,   WORLD!  (hello world)")], ["hello world"])
    assert got[(1, "hello world")] == (2, 1)


def test_gazetteer_no_partial_token_match(spark):
    got = _gaz(spark, [(1, "nationwide nation_7 internationally")], ["nation"])
    assert got == {}


def test_gazetteer_phrase_at_end_and_truncated(spark):
    got = _gaz(spark, [(1, "the end is near"), (2, "the end is")], ["is near"])
    assert got == {(1, "is near"): (1, 3)}


def test_gazetteer_plan_broadcast_no_cross(spark):
    from dbp_etl_spark.operators.text_search import gazetteer_match

    ddf = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    pdf = spark.createDataFrame([("a",)], "phrase string")
    plan = gazetteer_match(ddf, pdf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "Python" not in plan
