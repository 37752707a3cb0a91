"""Repetition scoring and PII redaction — training-data text filters.

Both operators are MAP-ONLY pure-JVM expression trees (higher-order
array functions / regexp_replace): zero shuffles, zero Python, so they
scale embarrassingly-parallel over a 100 TB corpus — the shape every
per-document filter in this engine targets.

* ``repetition_exprs`` — Gopher-style repetition signals (duplicate
  bigram fraction; most-frequent-token fraction) computed INSIDE the
  token array with transform/filter/array_distinct, no explode: an
  exploded bigram groupBy would shuffle the whole corpus by doc_id for
  per-doc-local math.
* ``redact_pii`` / ``pii_counts`` — ordered regexp_replace chain for
  the common PII shapes (email, IPv4, NANP-style phone). Patterns stay
  inside the RE2 ∩ Java-regex dialect (no lookaround) so the same
  pattern text runs on Spark, DuckDB oracles, and RE2-based scanners.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in order; email first so its
# local part is not chewed up by the narrower numeric patterns
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its placeholder (all patterns,
    all occurrences)."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column | str) -> Column:
    """Struct of per-pattern match counts (n_email, n_ipv4, n_phone) —
    the audit signal beside the redaction."""
    c = F.col(col) if isinstance(col, str) else col
    # regexp_extract_all's idx defaults to group 1; group 0 = full match
    return F.struct(
        *[
            F.size(F.regexp_extract_all(c, F.lit(pat), 0)).alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ]
    )


def repetition_exprs(tokens: Column) -> dict[str, Column]:
    """Repetition signals over a token array (Gopher-filter analogs).

    Returns columns keyed ``dup_bigram_frac`` (1 - distinct/total
    bigrams) and ``top_token_frac`` (most frequent token's share).
    All work happens inside the array: O(n·distinct) per row, map-only.
    """
    n_tok = F.size(tokens)
    bigrams = F.transform(
        F.sequence(F.lit(0), n_tok - 2),
        lambda i: F.concat(F.element_at(tokens, i + 1), F.lit(" "), F.element_at(tokens, i + 2)),
    )
    n_bi = n_tok - 1
    n_dist = F.size(F.array_distinct(bigrams))
    top_c = F.array_max(
        F.transform(
            F.array_distinct(tokens),
            lambda x: F.size(F.filter(tokens, lambda y: y == x)),
        )
    )
    # n_tok < 2 would make sequence(0, n_tok-2) descend and element_at
    # throw INVALID_ARRAY_INDEX_IN_ELEMENT_AT (one-token and empty docs
    # are certain in a web corpus); CaseWhen only evaluates the matched
    # branch, so the guard keeps short docs out of the bigram expression.
    return {
        "dup_bigram_frac": F.when(n_tok >= 2, F.round(1 - n_dist / n_bi, 4)).otherwise(
            F.lit(0.0)
        ),
        "top_token_frac": F.when(n_tok >= 1, F.round(top_c / n_tok, 4)).otherwise(
            F.lit(0.0)
        ),
    }


def bigram_lm_nll(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
):
    """In-corpus bigram language-model scoring — the CCNet-style "LM
    quality" filter with the pretrained model replaced by an n-gram
    model estimated on the corpus itself (no external artifacts, fully
    oracle-checkable): fluent/typical documents score low negative
    log-likelihood, gibberish and boilerplate-shuffled text score high.

    P(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V) with add-a smoothing
    (a = ``alpha``), c(.) corpus counts, V the corpus vocabulary size.
    Per doc: nll = -mean over bigram instances of ln P.

    Returns one row per input doc: (id, n_bigrams, nll) — nll NULL for
    docs with fewer than 2 tokens.

    Scale shape: the model IS two map-side-combinable aggregates
    (vocabulary-bounded unigram + bigram count tables); scoring is
    token-keyed equi-joins over the per-doc bigram groups (vocab side
    broadcastable) and one doc-keyed agg. No Python anywhere, and no
    per-instance join: instances are pre-grouped per (doc, w1, w2) so
    the join input is the doc's distinct-bigram set, not its length.
    """
    from pyspark.sql import DataFrame  # local import keeps module header light

    assert isinstance(docs, DataFrame)
    t = F.split(F.col(text_col), " ")
    toks = docs.select(F.col(id_col), t.alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("double").alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    big = (
        toks.where(F.size("t") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    dbig = big.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("k")
    )
    c2 = dbig.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))
    lp = F.log(
        (F.col("c2") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v"))
    )
    scored = (
        dbig.join(c2, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(vocab)
        .groupBy(id_col)
        .agg(F.sum(F.col("k") * lp).alias("s"), F.sum("k").alias("nb"))
    )
    return docs.select(F.col(id_col)).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("nb"), F.lit(0.0)).cast("bigint").alias("n_bigrams"),
        F.round(-F.col("s") / F.col("nb"), 4).alias("nll"),
    )


def dsir_log_ratio_table(
    docs, target_filter, n_buckets: int = 64, seed: int = 7,
    text_col: str = "text", sep: str = " ",
):
    """Hashed-unigram importance-weight table for DSIR-style data
    selection (Xie et al. 2023, arXiv:2302.03169): tokens hash into
    ``n_buckets`` features; each bucket's weight is the add-1-smoothed
    log probability ratio ln(p_target/p_raw), where target is the
    ``target_filter`` slice and raw is the whole corpus.

    Returns a python list of ``n_buckets`` floats (two bounded
    aggregations, each collecting at most n_buckets rows — the bucket
    COUNTS cross the driver, never documents; at corpus scale both
    count passes are plain map-side-combined groupBys over 10^10 rows).
    """
    import math

    from dbp_etl_spark.operators.dedup_ops import _h60

    tok = docs.select(
        target_filter.alias("_is_target"),
        F.explode(F.split(F.col(text_col), sep)).alias("t"),
    ).select("_is_target", (_h60(F.col("t"), seed) % n_buckets).alias("bkt"))
    counts = (
        tok.groupBy("bkt")
        .agg(
            F.count(F.lit(1)).alias("rc"),
            F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("tc"),
        )
        .collect()  # bounded: n_buckets rows
    )
    rc = {r["bkt"]: r["rc"] for r in counts}
    tc = {r["bkt"]: (r["tc"] or 0) for r in counts}
    r_tot, t_tot = sum(rc.values()), sum(tc.values())
    return [
        math.log((tc.get(b, 0) + 1.0) / (t_tot + n_buckets))
        - math.log((rc.get(b, 0) + 1.0) / (r_tot + n_buckets))
        for b in range(n_buckets)
    ]


def dsir_score_expr(
    log_ratios: list, text_col: str = "text", seed: int = 7, sep: str = " "
):
    """Per-document DSIR importance score: a sequential JVM fold over
    the document's own token array summing the bucket log-ratios
    (map-only — the table is inlined as literals, so scoring runs at
    IO speed with zero shuffles and zero Python in the hot path).
    Sequential fold order makes the float sum engine-reproducible."""
    from dbp_etl_spark.operators.dedup_ops import _h60

    n_buckets = len(log_ratios)
    arr = F.array(*[F.lit(float(x)) for x in log_ratios])
    toks = F.split(F.col(text_col), sep)
    return F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(arr, (_h60(t, seed) % n_buckets + 1).cast("int")),
    )
