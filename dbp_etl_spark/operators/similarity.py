"""Approximate nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k (exact; query side broadcast).
Scale path: random-hyperplane LSH — embeddings are bucketed by a
sign-bit sketch, probes only compare within matching buckets. The
hyperplanes are generated deterministically from a seed via xxhash64,
so bucket assignment is reproducible without shipping a matrix.

All vector math uses JVM-side higher-order functions (zip_with /
aggregate) over array<float> cast to double — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "qid",
    probe_vec: str = "qe",
) -> DataFrame:
    """Exact top-k: broadcast the (small) probe set against the corpus
    scan; one shuffle for the per-probe rank."""
    pairs = (
        F.broadcast(probes)
        .crossJoin(corpus)
        .filter(F.col(id_col) != F.col(probe_id))
        .select(
            probe_id,
            F.col(id_col).alias("cid"),
            cosine(F.col(probe_vec), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(probe_id, "cid", F.round("cos_sim", 3).alias("cos_sim"))
    )


def _hyperplane_sketch(vec: Column, dim: int, n_planes: int, seed: int) -> Column:
    """Sign-bit sketch: bit p = sign(v . h_p) where h_p[i] is a
    deterministic pseudo-random +/-1..scale weight derived from
    xxhash64(seed, p, i). Produces a long usable as an LSH bucket key."""
    def plane_dot(p: Column) -> Column:
        # weight_i = (hash(seed, p, i) % 2001 - 1000): symmetric around 0
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x.cast("double")
                * ((F.xxhash64(F.lit(seed), p, i) % 2001) - 1000).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(plane_dot(p) >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, b: acc * 2 + b.cast("long")
    )


def _formula_sketch(vec: Column, dim: int, n_planes: int) -> Column:
    """Oracle-reproducible sign-bit sketch: plane weights come from the
    closed-form ``((73*i + 37*p) % 97) - 48`` (integer-exact in a
    double), not a hash — so any engine re-derives the identical bucket
    from the raw vector. Returned as a bit STRING ('0101') to stay
    engine-neutral. Same cost shape as the xxhash sketch: one pass over
    the vector per plane, all JVM-side."""
    def plane_dot(p: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x.cast("double")
                * (((F.lit(73) * i + F.lit(37) * p) % 97) - 48).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(plane_dot(p) >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.concat_ws("", bits)


def embedding_neardup_pairs(
    corpus: DataFrame,
    dim: int,
    threshold: float = 0.98,
    n_planes: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: str = "xxhash64",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= t).

    Candidate generation via the hyperplane sketch (pairs must share a
    bucket — near-identical vectors almost surely do for small
    n_planes), then exact cosine verification. Self-join is bucketed:
    no cross product. Recall/cost tradeoff via n_planes, as in
    lsh_bucketed_topk. ``planes="formula"`` uses the
    oracle-reproducible sketch."""
    if planes == "formula":
        c = corpus.withColumn("bkt", _formula_sketch(F.col(vec_col), dim, n_planes))
    else:
        c = corpus.withColumn("bkt", _hyperplane_sketch(F.col(vec_col), dim, n_planes, seed))
    a = c.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bkt")
    b = c.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bkt")
    return (
        a.join(b, "bkt")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "qid",
    probe_vec: str = "qe",
    planes: str = "xxhash64",
) -> DataFrame:
    """Approximate top-k: compare only within matching hyperplane-sketch
    buckets. With n_planes=p the corpus splits into 2^p buckets, so each
    probe scans ~1/2^p of the data — the 100 TB path. Recall is
    tunable via p (fewer planes = bigger buckets = higher recall).
    ``planes="formula"`` switches to the oracle-reproducible sketch
    (_formula_sketch) so an external SQL engine re-derives the same
    buckets and therefore the same top-k."""
    if planes == "formula":
        c = corpus.withColumn("bkt", _formula_sketch(F.col(vec_col), dim, n_planes))
        p = probes.withColumn("bkt", _formula_sketch(F.col(probe_vec), dim, n_planes))
    else:
        c = corpus.withColumn("bkt", _hyperplane_sketch(F.col(vec_col), dim, n_planes, seed))
        p = probes.withColumn("bkt", _hyperplane_sketch(F.col(probe_vec), dim, n_planes, seed))
    pairs = (
        F.broadcast(p)
        .join(c, "bkt")
        .filter(F.col(id_col) != F.col(probe_id))
        .select(
            probe_id,
            F.col(id_col).alias("cid"),
            cosine(F.col(probe_vec), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(probe_id, "cid", F.round("cos_sim", 3).alias("cos_sim"))
    )


def kmeans_centroids(
    corpus: DataFrame,
    dim: int,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd iterations for an IVF coarse quantizer.

    Init: the k lowest-id vectors (deterministic, no RNG). Each
    iteration: assign every vector to its nearest centroid (broadcast
    join — centroids are tiny), then average per cell with
    element-wise aggregation. All JVM-side; one shuffle per iteration
    (the groupBy). At 100 TB you'd train on a sample — the assignment
    plan below is the same either way.

    Returns (centroid_id, centroid: array<double>).
    """
    cents = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("centroid_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"),
        )
        .withColumn("centroid_id", F.col("centroid_id") - 1)
    )
    for _ in range(iterations):
        assigned = _assign_nearest(corpus, cents, vec_col)
        # element-wise mean per cell: explode position, avg, re-collect
        cents = (
            assigned.select(
                "centroid_id",
                F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))),
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("col").alias("v"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
            .select(
                "centroid_id",
                F.transform(F.col("pv"), lambda s: s["v"]).alias("centroid"),
            )
        )
    return cents


def _assign_nearest(
    corpus: DataFrame, cents: DataFrame, vec_col: str
) -> DataFrame:
    """Tag every corpus row with the centroid_id of its nearest (by
    squared L2) centroid. The centroid table is tiny and bounded (k
    rows), so it is collected and inlined as literals: assignment
    becomes a pure map-side projection — ZERO shuffle of the corpus,
    which is what keeps IVF assignment viable over 100 TB. (A
    broadcast-join + per-row-group-by alternative re-shuffles the
    whole corpus including vectors — measurably the wrong plan.)

    Tie-break: smallest centroid_id (array_min over (d2, id) structs
    orders lexicographically)."""
    rows = cents.orderBy("centroid_id").collect()  # bounded: k centroids
    cent_list = [list(r["centroid"]) for r in rows]
    return assign_cells(corpus, cent_list, vec_col, out_col="centroid_id")


def assign_cells(
    df: DataFrame, centroids: list[list[float]], vec_col: str, out_col: str = "cell"
) -> DataFrame:
    """Tag rows with the index of the nearest centroid, with the
    centroid list inlined as literals (same zero-shuffle plan as
    ``_assign_nearest``; centroid ids are their list positions)."""

    def d2(centroid: list) -> "Column":
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.lit(centroid),
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    candidates = F.array(
        *[
            F.struct(d2(list(c)).alias("d"), F.lit(int(i)).alias("c"))
            for i, c in enumerate(centroids)
        ]
    )
    return df.withColumn(out_col, F.array_min(candidates)["c"])


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    train_iterations: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "qid",
    probe_vec: str = "qe",
) -> DataFrame:
    """IVF-flat approximate top-k: corpus rows are inverted-listed by
    nearest coarse centroid; each probe searches only its ``nprobe``
    nearest cells — the scan shrinks ~nprobe/n_cells, the standard IVF
    tradeoff. ``train_iterations=0`` keeps the quantizer at its
    deterministic init (lowest-id vectors), which makes the WHOLE
    search mirrorable in plain SQL for the driver's oracle; production
    would train with a few Lloyd iterations (kmeans_centroids,
    pytest-pinned) — the search plan is identical either way.
    """
    cents = kmeans_centroids(
        corpus, dim, k=n_cells, iterations=train_iterations, id_col=id_col, vec_col=vec_col
    )
    listed = _assign_nearest(corpus, cents, vec_col)

    # per probe: its nprobe nearest centroids
    d2 = F.aggregate(
        F.zip_with(
            F.col(probe_vec),
            F.col("centroid"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wp = Window.partitionBy(probe_id).orderBy(F.col("_d2"), F.col("centroid_id"))
    probe_cells = (
        probes.crossJoin(F.broadcast(cents))
        .withColumn("_d2", d2)
        .withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= nprobe)
        .select(probe_id, probe_vec, "centroid_id")
    )

    pairs = (
        F.broadcast(probe_cells)
        .join(listed, "centroid_id")
        .filter(F.col(id_col) != F.col(probe_id))
        .select(
            probe_id,
            F.col(id_col).alias("cid"),
            cosine(F.col(probe_vec), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("cos_sim").desc(), F.col("cid"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(probe_id, "cid", F.round("cos_sim", 3).alias("cos_sim"))
    )


def semdedup_prune(
    emb: DataFrame,
    dim: int,
    n_cells: int = 8,
    eps: float = 0.4,
    train_iterations: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    dedup over an embedding column. K-means clusters the corpus, then
    WITHIN each cluster a vector is dropped when a lower-id vector in
    the same cluster is a semantic duplicate (round(cosine, 4) >=
    ``eps`` — rounded so the threshold compare is engine-exact).
    Deterministic keeper election (lowest id survives) replaces the
    paper's random keeper, making the whole pass value-checkable.

    Returns (id, cell, keep).

    Scale shape: the clustering step IS the scalability argument — the
    pairwise cosine check runs only inside a cell, so candidate pairs
    are sum(|cell|^2) instead of n^2, and cell count is chosen to
    bound |cell| (the paper uses 50k clusters at 5B docs). Assignment
    is a zero-shuffle map-side projection over inlined centroids
    (`assign_cells`); the self-join shuffles by cell id; a hot cell is
    an ordinary AQE skew key. Centroid training is bounded by k and
    can run on a sample at corpus scale.
    """
    cents_df = kmeans_centroids(
        emb, dim=dim, k=n_cells, iterations=train_iterations, id_col=id_col, vec_col=vec_col
    )
    rows = cents_df.orderBy("centroid_id").collect()  # bounded: k centroids
    cent_list = [list(r["centroid"]) for r in rows]
    assigned = assign_cells(emb.select(id_col, vec_col), cent_list, vec_col, out_col="cell")
    a = assigned.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"), "cell"
    )
    b = assigned.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"), "cell"
    )
    sim = F.round(cosine(F.col("a_vec"), F.col("b_vec")), 4)
    dropped = (
        a.join(b, "cell")
        .where(F.col("a_id") < F.col("b_id"))
        .where(sim >= F.lit(eps))
        .select(F.col("b_id").alias(id_col))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return assigned.join(dropped, id_col, "left").select(
        F.col(id_col),
        F.col("cell").cast("long").alias("cell"),
        F.coalesce(~F.col("_dropped"), F.lit(True)).alias("keep"),
    )
