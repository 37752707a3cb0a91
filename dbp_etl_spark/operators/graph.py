"""Distributed graph primitives: connected components + PageRank.

Why here: the near-dup operators (operators/dedup_ops.py) stop at
*pairs* — but deduplicating a corpus requires grouping pairs into
clusters and electing one keeper per cluster (the reference's
latest-wins reducer, /root/reference/load/FilenameReducer.py:73-120,
is the exact-key special case of the same "pick one representative
per equivalence class" step). Connected components over the candidate
pair graph is that grouping; PageRank over a purchase/link graph is
the standard "importance" rollup a web-corpus pipeline runs next.

Scale design (the 100 TB lens):

* ``connected_components`` is the alternating large-star / small-star
  algorithm (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC'14): O(log^2 n) rounds worst case, 2 rounds on the
  star-shaped clusters LSH dedup actually produces. Each half-round is
  ONE groupBy-min plus ONE equi-join — no ``collect_list`` adjacency
  arrays, so a 10M-edge super-node is an ordinary AQE-splittable skew
  key, never a driver-side array. Convergence is detected with a
  2-scalar aggregate (edge count + order-insensitive xxhash sum), not
  a full ``except`` diff.
* ``pagerank`` is classic power iteration as DataFrame joins: ranks
  live in a (node, pr) frame, contributions are one join + one
  groupBy-sum per iteration, and the dangling-node mass is a 1-row
  aggregate cross-joined back (broadcast) — nothing is collected to
  the driver inside the loop.
* Both loops ``localCheckpoint`` per iteration to truncate lineage —
  on a cluster this is the standard iterative-algorithm hygiene that
  keeps the DAG from growing O(iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_fingerprint(edges: DataFrame, a: str, b: str) -> tuple[int, int]:
    """(count, order-insensitive hash-sum) — a cheap stable identity
    for an edge set, used as the convergence test."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(F.col(a), F.col(b)).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge
    list. Returns (node, component) for every node that appears in an
    edge, where ``component`` is the smallest node id in its component
    (self row included for representatives).

    Node ids must be orderable and non-null; duplicate / reversed /
    self-loop edges are tolerated.

    Alternating large-star / small-star until the edge set is stable,
    at which point every surviving edge is (node -> component-min).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .select(
            F.greatest("u", "v").alias("hi"), F.least("u", "v").alias("lo")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("hi").alias("node"))
        .union(e.select("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    prev = _edge_fingerprint(e, "hi", "lo")
    for _ in range(max_iter):
        # -- large-star: every neighbor v > u links to m(u) = min(N(u) ∪ {u})
        sym = e.select(F.col("hi").alias("a"), F.col("lo").alias("b")).union(
            e.select(F.col("lo"), F.col("hi"))
        )
        mins = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        large = (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("hi"), F.col("m").alias("lo"))
            .where(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # -- small-star over (hi -> lo) oriented edges: hi and all its
        #    smaller neighbors link to the smallest of them
        pmins = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(pmins, "hi")
            .select(F.col("lo").alias("a"), F.col("m"))
            .where(F.col("a") != F.col("m"))
            .select(F.col("a").alias("hi"), F.col("m").alias("lo"))
            .union(pmins.select(F.col("hi"), F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _edge_fingerprint(small, "hi", "lo")
        e = small
        if cur == prev:
            break
        prev = cur

    # at convergence every node has exactly one (node -> component-min)
    # edge; the groupBy-min also keeps the mapping single-valued (best
    # known label) if max_iter cut the loop short on an adversarial graph
    labels = e.groupBy(F.col("hi").alias("node")).agg(F.min("lo").alias("comp"))
    return nodes.join(labels, "node", "left").select(
        F.col("node"), F.coalesce(F.col("comp"), F.col("node")).alias("component")
    )


def neardup_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster near-dup *pairs* into components and elect one keeper
    per cluster — the action half of corpus dedup: after this, keep
    ``is_keeper`` rows and drop the rest.

    Returns one row per document in ``docs``:
    (doc_id, component, cluster_size, is_keeper) where component is
    the min doc id of the cluster (singletons: the doc itself),
    cluster_size counts docs in the cluster, and the keeper is the
    component representative (min id — deterministic, engine-neutral).
    """
    cc = connected_components(pairs, src=id_a, dst=id_b)
    labeled = (
        docs.select(F.col(id_col))
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
    )
    sizes = labeled.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return labeled.join(sizes, "component").select(
        F.col(id_col),
        F.col("component"),
        F.col("cluster_size"),
        (F.col(id_col) == F.col("component")).alias("is_keeper"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """PageRank by power iteration over a directed edge list (edges
    deduplicated; unweighted). Returns (node, pr) over every node that
    appears as src or dst, with sum(pr) == 1 (dangling mass is
    redistributed uniformly each iteration, the textbook formulation).

    Every iteration is: one equi-join (ranks -> edges on src), one
    groupBy-sum keyed by dst, and a 1-row dangling-mass aggregate
    cross-joined back (Spark broadcasts single-row frames). No driver
    collect inside the loop; lineage truncated per iteration
    (``checkpoint=False`` keeps the plan lazy — small graphs / plan
    inspection; leave True for production iteration counts).
    """
    ckpt = (lambda df: df.localCheckpoint(eager=True)) if checkpoint else (lambda df: df)
    e = ckpt(
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
    )
    nodes = e.select(F.col("s").alias("node")).union(e.select("d")).distinct()
    n_nodes = nodes.count()  # one scalar: fixes the 1/N constants
    if n_nodes == 0:
        return nodes.select(F.col("node"), F.lit(0.0).alias("pr"))
    outdeg = e.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    # (node, outdeg or null) — null marks dangling nodes
    base = ckpt(nodes.join(outdeg.withColumnRenamed("s", "node"), "node", "left"))

    ranks = base.select("node", "outdeg", F.lit(1.0 / n_nodes).alias("pr"))
    for _ in range(iters):
        dangling = ranks.where(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dang")
        )
        contribs = (
            e.join(
                ranks.select(F.col("node").alias("s"), "pr", "outdeg"), "s"
            )
            .select(F.col("d").alias("node"), (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            base.join(contribs, "node", "left")
            .crossJoin(dangling)
            .select(
                "node",
                "outdeg",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dang") / n_nodes)
                ).alias("pr"),
            )
        )
        ranks = ckpt(ranks)
    return ranks.select("node", "pr")


def resolve_redirects(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 48,
) -> DataFrame:
    """Resolve redirect chains to their terminal target by pointer
    doubling. Input is a directed edge list (``src`` redirects to
    ``dst``); multiple out-edges per src are collapsed to min(dst) so
    the graph is functional and the result deterministic. Returns one
    row per distinct redirect source:

        (node, final, hops, is_cycle)

    where ``final`` is the first node reached that has no out-edge,
    ``hops`` the number of edges followed, and ``is_cycle`` flags
    sources whose walk never terminates (they sit on or feed into a
    redirect loop; ``final``/``hops`` are NULL for them).

    Why this shape (the reference resolves asset moves one row at a
    time in Python — /root/reference/load/UpdateDBPFilesetTables.py
    re-reads state per record; a 100 TB crawl snapshot cannot): pointer
    doubling composes the walk with itself each round, so a chain of
    length L resolves in ceil(log2 L) self-joins instead of L
    sequential lookups. Each round is ONE equi-join of the state frame
    with itself keyed by the current pointer — an AQE-friendly shuffle
    join, no driver-side maps, no per-row recursion. Cycles cannot
    terminate, so the loop stops when every row is done or after
    ceil(log2 n)+2 rounds, at which point any open row is provably on
    a cycle (a terminating walk has length < n).
    """
    f = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("ptr"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .groupBy("node")
        .agg(F.min("ptr").alias("ptr"))
        .localCheckpoint(eager=True)
    )
    n_src = f.count()
    if n_src == 0:
        return f.select(
            "node",
            F.col("ptr").alias("final"),
            F.lit(None).cast("bigint").alias("hops"),
            F.lit(False).alias("is_cycle"),
        )
    # a row is done when its pointer is not itself a redirect source
    srcs = f.select(F.col("node").alias("_o")).withColumn("_has", F.lit(True))
    state = (
        f.join(srcs, F.col("ptr") == F.col("_o"), "left")
        .select(
            "node",
            "ptr",
            F.lit(1).cast("bigint").alias("hops"),
            F.coalesce(~F.col("_has"), F.lit(True)).alias("done"),
        )
        .localCheckpoint(eager=True)
    )
    rounds = min(max_rounds, max(1, n_src.bit_length() + 2))
    for _ in range(rounds):
        open_n = state.where(~F.col("done")).count()
        if open_n == 0:
            break
        nxt = state.select(
            F.col("node").alias("_jn"),
            F.col("ptr").alias("_jptr"),
            F.col("hops").alias("_jhops"),
            F.col("done").alias("_jdone"),
        )
        state = (
            state.join(nxt, (F.col("ptr") == F.col("_jn")) & ~F.col("done"), "left")
            .select(
                "node",
                F.when(F.col("done") | F.col("_jn").isNull(), F.col("ptr"))
                .otherwise(F.col("_jptr"))
                .alias("ptr"),
                F.when(F.col("done") | F.col("_jn").isNull(), F.col("hops"))
                .otherwise(F.col("hops") + F.col("_jhops"))
                .alias("hops"),
                (F.col("done") | F.coalesce(F.col("_jdone"), F.lit(False))).alias("done"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "node",
        F.when(F.col("done"), F.col("ptr")).alias("final"),
        F.when(F.col("done"), F.col("hops")).cast("bigint").alias("hops"),
        (~F.col("done")).alias("is_cycle"),
    )
