"""Weighted sampling without replacement — Efraimidis–Spirakis keys.

Data-mixing primitive for corpus curation: draw k documents per
stratum (domain, language, source) with inclusion probability
proportional to a per-document weight (token count, quality score),
reproducibly. The classic one-pass formulation (Efraimidis &
Spirakis 2006, "Weighted random sampling with a reservoir"): give each
row the key ``u^(1/w)`` with u ~ Uniform(0,1] and keep the k largest
keys — equivalently (and numerically safer) keep the k largest
``ln(u)/w``. u comes from the engine's cross-engine 60-bit md5 hash
(operators/dedup_ops._h60), so the SAME sample falls out of Spark, the
DuckDB oracle, and any rerun at any parallelism.

Scale shape: top-k per stratum via a single window would funnel each
stratum through one reducer — a 10^10-row corpus with a handful of
languages dies there. Instead, two-phase salted selection: a salted
window keeps k survivors per (stratum, salt) shard, then a second
window over the <= salt_buckets*k survivors picks the final k. The
salt only shards the work; selection is by key order, so the result is
identical to the unsalted form (pinned by test). The reference's
sampling analog is its fileset spot-check subsetting
(/root/reference/load/Validate.py) — unweighted and single-node; the
weighted form is what token-budget data mixing actually needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbp_etl_spark.operators.dedup_ops import _h60

_TWO_60 = float(1 << 60)


def es_key(id_col: Column, weight_col: Column, seed: int = 7) -> Column:
    """ln(u)/w with u = (h60(id)+1)/2^60 ∈ (0, 1] — larger is better.

    Weights must be > 0; NULL/non-positive weights yield NULL keys
    (excluded from the sample) rather than poisoning the ordering.
    """
    u = (_h60(id_col.cast("string"), seed) + 1) / F.lit(_TWO_60)
    w = weight_col.cast("double")
    return F.when(w > 0, F.log(u) / w)


def weighted_sample_stratified(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 7,
    salt_buckets: int = 32,
) -> DataFrame:
    """Top-k Efraimidis–Spirakis sample per stratum; adds ``rank``
    (1-based within stratum, best key first, id tiebreak). Input
    columns pass through unchanged."""
    key = es_key(F.col(id_col), F.col(weight_col), seed).alias("_es_key")
    keyed = df.select("*", key).where(F.col("_es_key").isNotNull())
    order = [F.col("_es_key").desc(), F.col(id_col).asc()]
    # phase 1: per-(stratum, salt) local top-k — bounds any reducer's
    # input to its shard, hot strata spread over salt_buckets reducers
    salt = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(salt_buckets))
    w1 = Window.partitionBy(stratum_col, "_salt").orderBy(*order)
    survivors = (
        keyed.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    # phase 2: exact top-k over <= salt_buckets*k survivors per stratum
    w2 = Window.partitionBy(stratum_col).orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .drop("_es_key")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: list[tuple[str, int]] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Leakage-safe deterministic holdout split: assign every row to a
    named split by hashing ``key_col`` — NOT by random() and NOT by
    row position. ``splits`` is [(name, percent), ...] summing to 100.

    The property that matters for training data: the split is a pure
    function of the key, so (a) all rows sharing a key (all pages of a
    host, all chunks of a doc) land in the SAME split — val/test can
    never share a host/doc with train (the standard contamination
    vector random row-splits create), (b) re-runs, retries, and
    late-arriving rows of the same key are split-stable with no state
    to store, and (c) growing the corpus never moves an existing key
    between splits. Map-only JVM expression: zero shuffles at any
    scale. Use the registrable domain (functions/urls.py
    etld_plus_one) as the key for host-disjoint LLM corpus splits.
    """
    splits = splits or [("train", 80), ("val", 10), ("test", 10)]
    if sum(p for _, p in splits) != 100:
        raise ValueError("split percents must sum to 100")
    bucket = _h60(F.col(key_col), seed) % 100
    edge = 0
    expr = None
    for name, pct in splits:
        edge += pct
        cond = bucket < edge
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)
