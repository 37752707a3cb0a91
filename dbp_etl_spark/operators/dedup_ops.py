"""Near-duplicate detection for web-text corpora.

The reference dedups exactly-keyed rows (latest-timestamp-wins,
/root/reference/load/FilenameReducer.py:73-120). A training-data
pipeline additionally needs *content* dedup; this module provides the
standard ladder, each as a composition of built-in DataFrame ops —
no Python UDFs anywhere:

* exact          — hash-groupBy on content bytes
* minhash + LSH  — shingle -> k minhashes -> banded bucket join
* simhash        — 64-bit weighted-bit fingerprint + chunked hamming join
* n-gram jaccard — exact verification for candidate pairs

Scale notes: all candidate generation is equi-join-shaped (band/bucket
keys), so Spark shuffles by bucket key instead of computing O(n^2)
pairs; verification only runs on candidates. Hash functions are
xxhash64 with integer seeds — deterministic across runs/partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: keeper = min(id). Returns
    (content_hash, n_copies, keeper)."""
    return df.groupBy(F.md5(F.col(content_col)).alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keeper")
    )


def _shingles(content_col: str, n: int):
    """Word n-gram shingles as an array column (JVM-side)."""
    toks = F.split(F.col(content_col), " ")
    # transform over positions 0..size-n
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) — k independent minhashes over word
    shingles. One explode + one groupBy with k min-aggregates: a single
    shuffle keyed by doc id."""
    sh = df.select(F.col(id_col), F.explode(_shingles(content_col, shingle_n)).alias("sh"))
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"h{i}") for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) whose minhash signatures
    collide in >=1 LSH band. Pair generation is an equi-join on
    (band_idx, band_hash) — no cross product."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, id_col, content_col, num_hashes, shingle_n)
    banded = sig.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(F.slice(F.col("sig"), b * rows + 1, rows), lambda x: x.cast("string")))
                    ).alias("bh"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bh")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact jaccard over word shingle SETS for candidate pairs only.
    Join-shaped: candidates x2 small lookups against the shingle-set
    table; array_intersect/union run JVM-side."""
    sets = df.select(
        F.col(id_col), F.array_distinct(_shingles(content_col, shingle_n)).alias("sset")
    )
    a = sets.select(F.col(id_col).alias("id_a"), F.col("sset").alias("set_a"))
    b = sets.select(F.col(id_col).alias("id_b"), F.col("sset").alias("set_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size(F.array_union("set_a", "set_b"))
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "text"
) -> DataFrame:
    """(id, simhash: long) — 64-bit simhash over word tokens.

    One explode + one groupBy with 64 conditional sums (single
    shuffle); the bit-majority vote is assembled JVM-side. At 100 TB
    this is a map-side-combinable aggregation — scales linearly."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(content_col), " ")).alias("tok")
    ).withColumn("th", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = toks.groupBy(id_col).agg(*aggs)
    sh = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sh = term if sh is None else sh.bitwiseXOR(term)
    return votes.select(F.col(id_col), sh.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    max_hamming: int = 7,
    n_chunks: int = 8,
) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) <= max_hamming.

    Candidate generation by pigeonhole: the 64-bit hash splits into
    ``n_chunks`` equal chunks; any pair with hamming < n_chunks shares
    at least one exact chunk, so candidates come from an equi-join on
    (chunk_idx, chunk_value) and are verified with bit_count(xor).
    Guaranteed recall requires max_hamming < n_chunks. Smaller chunks
    = more candidate collisions: at corpus scale prefer n_chunks just
    above the target hamming (and/or pre-partition by a coarse key)."""
    if max_hamming >= n_chunks:
        raise ValueError("guaranteed recall needs max_hamming < n_chunks")
    chunk_bits = 64 // n_chunks
    mask = (1 << chunk_bits) - 1
    sh = simhash(df, id_col, content_col)
    chunks = sh.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright(F.col("simhash"), i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "ci", "cv")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "ci", "cv")
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
