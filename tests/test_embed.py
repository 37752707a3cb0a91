"""Feature-hashing text embedder + chunk -> embed -> IVF pipeline."""

from pyspark.sql import functions as F

from dbp_etl_spark.functions.embed import hash_embedding, tokenize
from dbp_etl_spark.operators.derive import chunk_documents
from dbp_etl_spark.operators.similarity import brute_force_topk, ivf_topk


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_hash_embedding_unit_norm_and_determinism(spark):
    docs = _docs(spark).limit(50)
    for mode in ("xxhash64", "md5_60"):
        out = docs.select(
            "doc_id", hash_embedding(F.col("text"), dim=16, hash_fn=mode).alias("v")
        )
        rows = {r["doc_id"]: r["v"] for r in out.collect()}
        rows2 = {r["doc_id"]: r["v"] for r in out.collect()}
        assert rows == rows2  # deterministic
        for v in rows.values():
            assert len(v) == 16
            n = sum(x * x for x in v) ** 0.5
            assert abs(n - 1.0) < 1e-9 or n == 0.0


def test_hash_embedding_empty_text_is_zero_vector(spark):
    df = spark.createDataFrame([("", 1), ("???!!!", 2)], "text string, id int")
    out = df.select(hash_embedding(F.col("text"), dim=8).alias("v")).collect()
    for r in out:
        assert r["v"] == [0.0] * 8


def test_hash_embedding_matches_explode_groupby_reference(spark):
    """The zero-shuffle dense fold must equal the classic explode ->
    groupBy(bucket) -> densify shape (the high-dim alternative)."""
    docs = _docs(spark).limit(30)
    dim = 16
    fold = {
        r["doc_id"]: r["v"]
        for r in docs.select(
            "doc_id",
            hash_embedding(F.col("text"), dim=dim, hash_fn="md5_60", normalize=False).alias("v"),
        ).collect()
    }
    h60 = lambda c, s: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat_ws("|", c, F.lit(str(s)))), 1, 15), 16, 10
    ).cast("long")
    ref_rows = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
        .select(
            "doc_id",
            F.pmod(h60(F.col("tok"), 0), F.lit(dim)).alias("b"),
            (F.lit(1.0) - F.lit(2.0) * F.pmod(h60(F.col("tok"), 1), F.lit(2))).alias("s"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("s").alias("v"))
        .collect()
    )
    ref = {d: [0.0] * dim for d in fold}
    for r in ref_rows:
        ref[r["doc_id"]][r["b"]] = r["v"]
    assert fold == ref


def test_embedding_stage_is_shuffle_free(spark):
    docs = _docs(spark)
    plan = docs.select(
        "doc_id", hash_embedding(F.col("text"), dim=16).alias("v")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_embed_ivf_pipeline(spark):
    """End-to-end training-data leg: chunk docs -> embed each chunk ->
    IVF top-k chunk retrieval. With nprobe == n_cells IVF scans every
    cell, so it must return exactly the brute-force result."""
    docs = _docs(spark).limit(40)
    chunks = chunk_documents(docs, chunk_tokens=16, overlap=4)
    vecs = chunks.select(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("chunk_idx").cast("string")).alias(
            "vec_id"
        ),
        hash_embedding(F.col("chunk_text"), dim=16).alias("embedding"),
    )
    probes = vecs.limit(3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    exact = brute_force_topk(vecs, probes, k=3, id_col="vec_id")
    ivf_all = ivf_topk(
        vecs, probes, dim=16, k=3, n_cells=4, nprobe=4, id_col="vec_id"
    )
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, ivf_all.collect()))
    assert a == b and len(a) == 9
    # approximate mode still returns k rows per probe
    approx = ivf_topk(vecs, probes, dim=16, k=3, n_cells=4, nprobe=2, id_col="vec_id")
    assert approx.groupBy("qid").count().filter(F.col("count") != 3).count() == 0
