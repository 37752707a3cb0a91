"""Deterministic GPU-free text embeddings via feature hashing.

``hash_embedding`` maps ``text -> array<double>(dim)``: tokens are
hashed to one of ``dim`` buckets with a ±1 sign (the classic hashing
trick — Weinberger et al., "Feature Hashing for Large Scale Multitask
Learning"), counts accumulate per bucket, and the vector is
L2-normalized. This feeds the existing ANN / embedding-near-dup family
(operators/similarity.py) directly from raw text — the training-data
pipeline's "embed then dedup/search" leg with no model dependency.

Physical shape: ENTIRELY map-side JVM higher-order functions (split →
transform → aggregate fold) — zero shuffles, zero Python; at 100 TB
the embedding stage pipelines into whatever shuffle the downstream
consumer (LSH bucketing, IVF assignment) needs anyway. Cost is
O(tokens × dim) per row from the dense fold, the right trade for the
small dims (16-128) feature hashing targets; for dim in the thousands
prefer the explode → groupBy(doc, bucket) → pivot shape instead.

Hash modes follow operators/dedup_ops.py: ``xxhash64`` (production
default, one JVM hash per token) or ``md5_60`` (first 15 hex chars of
md5 parsed base-16 — bit-identical re-derivable in DuckDB/ANSI SQL, so
the whole embed→ANN pipeline is oracle-checkable; values stay exact
integer counts until one final normalize, so results are bitwise
identical across engines and fold orders).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _tok_hash(tok: Column, seed: int, hash_fn: str) -> Column:
    if hash_fn == "md5_60":
        return F.conv(
            F.substring(F.md5(F.concat_ws("|", tok, F.lit(str(seed)))), 1, 15), 16, 10
        ).cast("long")
    return F.abs(F.xxhash64(tok, F.lit(seed)))


def tokenize(col: Column) -> Column:
    """Lowercased alphanumeric tokens (the corpus-neutral splitter)."""
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != "")


def hash_embedding(
    col: Column, dim: int = 16, seed: int = 0, hash_fn: str = "xxhash64", normalize: bool = True
) -> Column:
    """Feature-hashed embedding of a text column: array<double>(dim).

    bucket(t) = h(t, seed) mod dim; sign(t) = ±1 from h(t, seed+1);
    cell values are exact signed token counts, then (optionally) one
    L2 normalize. An all-empty text yields the zero vector.
    """
    toks = tokenize(col)
    # one struct per token so each token hashes twice total (bucket +
    # sign), not once per (token, index) pair inside the dense fold
    tok_bs = F.transform(
        toks,
        lambda t: F.struct(
            F.pmod(_tok_hash(t, seed, hash_fn), F.lit(dim)).alias("b"),
            (F.lit(1.0) - F.lit(2.0) * F.pmod(_tok_hash(t, seed + 1, hash_fn), F.lit(2))).alias(
                "s"
            ),
        ),
    )
    zero = F.array_repeat(F.lit(0.0), dim)
    acc = F.aggregate(
        tok_bs,
        zero,
        lambda a, ts: F.transform(
            a, lambda v, i: v + F.when(ts["b"] == i.cast("long"), ts["s"]).otherwise(F.lit(0.0))
        ),
    )
    if not normalize:
        return acc
    nrm = F.sqrt(F.aggregate(F.transform(acc, lambda v: v * v), F.lit(0.0), lambda s, v: s + v))
    return F.when(nrm > 0, F.transform(acc, lambda v: v / nrm)).otherwise(acc)
