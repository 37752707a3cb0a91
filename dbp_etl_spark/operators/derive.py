"""Derived-row generation and key normalization.

Reference analogs:
* U4/U5 — audio/video transcode jobs return derived filesets (HLS
  variants at fixed bitrates) that re-enter the pipeline
  (/root/reference/load/AWSTranscoder.py:95-127, variant table
  VIDEO_VARIANTS /root/reference/load/InputFileset.py:83-95). Spark
  form: explode a literal variant-spec array — pure JVM, no external
  calls.
* J7 — loose/fuzzy key joins via 10-char damId normalization and
  retry probing (/root/reference/load/LPTSExtractReader.py:116-143):
  generalized to a deterministic key-normalization column followed by
  a plain equi-join (never a fuzzy join operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_VARIANTS = (
    ("av", 360, 588000),
    ("av", 480, 880000),
    ("av", 720, 1880000),
)


def derive_variants(
    df: DataFrame,
    variants: tuple[tuple[str, int, int], ...] = DEFAULT_VARIANTS,
    key: str = "url",
) -> DataFrame:
    """One derived row per (input row x variant spec): the transcode
    fan-out as a JVM-side explode. Output adds (variant_kind,
    resolution, bandwidth, variant_url)."""
    spec = F.array(
        *[
            F.struct(
                F.lit(kind).alias("variant_kind"),
                F.lit(res).alias("resolution"),
                F.lit(bw).alias("bandwidth"),
            )
            for kind, res, bw in variants
        ]
    )
    exploded = df.withColumn("_v", F.explode(spec))
    return exploded.select(
        *df.columns,
        F.col("_v.variant_kind").alias("variant_kind"),
        F.col("_v.resolution").alias("resolution"),
        F.col("_v.bandwidth").alias("bandwidth"),
        F.concat(
            F.col(key), F.lit("#"), F.col("_v.variant_kind"), F.col("_v.resolution").cast("string")
        ).alias("variant_url"),
    )


def normalize_url(col: Column) -> Column:
    """Deterministic URL canonicalization for loose-key joins:
    lowercase scheme+host, strip a leading www., drop fragment, strip
    one trailing slash. Two urls that normalize equal are then joined
    with a plain equi-join."""
    c = F.regexp_replace(col, r"#.*$", "")  # fragment
    # lowercase scheme://host part only
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z]+://[^/]+)", 1)),
        F.regexp_extract(c, r"^[a-zA-Z]+://[^/]+(.*)$", 1),
    )
    c = F.regexp_replace(c, r"^(https?://)www\.", r"$1")
    return F.regexp_replace(c, r"/$", "")


def chunk_documents(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
):
    """Split documents into overlapping token-window chunks — the
    standard pre-tokenization unit for training pipelines (1 doc ->
    ceil((n-overlap)/(chunk-overlap)) rows). Pure JVM array ops:
    split -> transform over chunk starts -> posexplode; no Python, no
    shuffle (map-only until the caller aggregates).

    Returns (id, chunk_idx, chunk_text, n_chunk_tokens).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(overlap)) / F.lit(step)), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(toks, i * step + 1, chunk_tokens)),
    )
    out = df.select(
        F.col(id_col),
        F.size(toks).alias("_n_toks"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    # token count by arithmetic, not a second split over the chunk text
    n_tokens = F.least(
        F.lit(chunk_tokens), F.col("_n_toks") - F.col("chunk_idx") * step
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        n_tokens.cast("long").alias("n_chunk_tokens"),
    )
