"""Connected components + PageRank (operators/graph.py)."""

import math

import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.operators.graph import (
    connected_components,
    neardup_components,
    pagerank,
)


def _cc_map(spark, edges, **kw):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def _python_cc(edges):
    """Union-find oracle."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # path-compress to roots, then relabel roots to component min
    comp = {}
    for x in list(parent):
        comp[x] = find(x)
    return comp


def test_cc_path_graph_worst_case(spark):
    # a path is the worst case for naive label propagation — the
    # star-contraction algorithm must still collapse it
    edges = [(i, i + 1) for i in range(30)]
    got = _cc_map(spark, edges)
    assert got == {i: 0 for i in range(31)}


def test_cc_multiple_components_dirty_edges(spark):
    # duplicates, reversed edges and self-loops are tolerated
    edges = [(1, 2), (2, 1), (2, 3), (3, 3), (10, 11), (12, 11), (12, 11), (20, 20)]
    got = _cc_map(spark, edges)
    want = _python_cc([(u, v) for u, v in edges if u != v])
    assert got == want
    assert got[3] == 1 and got[12] == 10
    # pure self-loop node 20 drops out (no real edge): not in output
    assert 20 not in got


def test_cc_matches_union_find_on_random_graph(spark):
    import random

    rnd = random.Random(7)
    edges = [(rnd.randrange(200), rnd.randrange(200)) for _ in range(150)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _cc_map(spark, edges)
    assert got == _python_cc(edges)


def test_cc_string_ids(spark):
    got = _cc_map(spark, [("b", "a"), ("b", "c"), ("x", "y")])
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_neardup_components_keeper_election(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 3), (3, 5), (2, 6)], ["id_a", "id_b"])
    rows = {r["doc_id"]: r for r in neardup_components(docs, pairs).collect()}
    assert rows[1]["component"] == 1 and rows[3]["component"] == 1
    assert rows[5]["component"] == 1 and rows[5]["cluster_size"] == 3
    assert not rows[5]["is_keeper"] and rows[1]["is_keeper"]
    assert rows[2]["component"] == 2 and rows[6]["component"] == 2
    # singletons keep themselves
    for d in (0, 4, 7):
        assert rows[d]["is_keeper"] and rows[d]["cluster_size"] == 1
    # a dedup keeps exactly one doc per cluster
    keepers = [d for d, r in rows.items() if r["is_keeper"]]
    assert sorted(keepers) == [0, 1, 2, 4, 7]


def _python_pagerank(edges, iters, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    pr = {x: 1.0 / n for x in nodes}
    for _ in range(iters):
        dang = sum(p for x, p in pr.items() if x not in out)
        contrib = {x: 0.0 for x in nodes}
        for s, t in edges:
            contrib[t] += pr[s] / out[s]
        pr = {
            x: (1.0 - d) / n + d * (contrib[x] + dang / n) for x in nodes
        }
    return pr


def test_pagerank_matches_python_mirror_and_sums_to_one(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
        ("e", "d"), ("e", "c"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=5).collect()}
    want = _python_pagerank(edges, iters=5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_mass_conserved(spark):
    # b and c are dangling: without redistribution sum(pr) would decay
    df = spark.createDataFrame([("a", "b"), ("a", "c")], ["src", "dst"])
    got = {r["node"]: r["pr"] for r in pagerank(df, iters=4).collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["b"] == pytest.approx(got["c"], abs=1e-15)
    assert got["b"] > got["a"]


def test_pagerank_duplicate_edges_collapse(spark):
    df1 = spark.createDataFrame([("a", "b"), ("a", "b"), ("b", "a")], ["src", "dst"])
    df2 = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    g1 = sorted((r["node"], round(r["pr"], 12)) for r in pagerank(df1, iters=3).collect())
    g2 = sorted((r["node"], round(r["pr"], 12)) for r in pagerank(df2, iters=3).collect())
    assert g1 == g2


def test_cc_truncated_iterations_mapping_stays_single_valued(spark):
    # with max_iter too small for full convergence the labels may not
    # all reach the component min, but each node still gets EXACTLY ONE
    # row (no join fan-out) and labels never leave the component
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = connected_components(df, max_iter=1).collect()
    nodes = [r["node"] for r in out]
    assert sorted(nodes) == list(range(31))  # one row per node
    assert all(r["component"] <= r["node"] for r in out)


# ---------------------------------------------------------------- redirects


def _resolve_map(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    from dbp_etl_spark.operators.graph import resolve_redirects

    return {
        r["node"]: (r["final"], r["hops"], r["is_cycle"])
        for r in resolve_redirects(df).collect()
    }


def test_redirect_simple_chain(spark):
    got = _resolve_map(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: (4, 3, False), 2: (4, 2, False), 3: (4, 1, False)}


def test_redirect_long_chain_log_rounds(spark):
    # chain of 65 nodes exercises > 6 doubling rounds
    n = 65
    got = _resolve_map(spark, [(i, i + 1) for i in range(n)])
    assert got[0] == (n, n, False)
    assert got[n - 1] == (n, 1, False)
    assert all(not c for (_, _, c) in got.values())


def test_redirect_pure_cycle_and_feeder(spark):
    # 10 -> 11 -> 12 -> 10 cycle, 9 feeds into it, 1 -> 2 terminates
    got = _resolve_map(spark, [(10, 11), (11, 12), (12, 10), (9, 10), (1, 2)])
    assert got[1] == (2, 1, False)
    for n in (9, 10, 11, 12):
        assert got[n] == (None, None, True)


def test_redirect_multi_out_edge_collapses_to_min(spark):
    # 1 has two targets; min(dst)=2 wins deterministically
    got = _resolve_map(spark, [(1, 5), (1, 2), (2, 3)])
    assert got[1] == (3, 2, False)


def test_redirect_self_loop_is_cycle(spark):
    got = _resolve_map(spark, [(7, 7), (1, 7)])
    assert got[7] == (None, None, True)
    assert got[1] == (None, None, True)


def test_redirect_empty(spark):
    from dbp_etl_spark.operators.graph import resolve_redirects

    df = spark.createDataFrame([], "src bigint, dst bigint")
    assert resolve_redirects(df).count() == 0
