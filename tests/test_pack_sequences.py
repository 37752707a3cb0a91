"""GPT-style sequence packing: two-phase prefix sum == naive window."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from dbp_etl_spark.operators.windows import pack_sequences


def _docs(spark):
    rows = [(i, (i * 37) % 90 + (10 if i % 7 else 0)) for i in range(200)]
    rows[13] = (13, 0)  # an empty doc spans no packs
    return spark.createDataFrame(rows, "doc_id int, n_tok int")


def test_pack_sequences_matches_naive_global_window(spark):
    d = _docs(spark)
    got = pack_sequences(
        d,
        seq_len=128,
        tokens_col="n_tok",
        order_by=["doc_id"],
        coarse_key=(F.col("doc_id") / 16).cast("long"),
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    start = F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("long")
    naive = d.select(
        "doc_id",
        start.alias("start_offset"),
        F.when(F.col("n_tok") > 0, (start / 128).cast("long")).alias("first_pack"),
        F.when(
            F.col("n_tok") > 0, ((start + F.col("n_tok") - 1) / 128).cast("long")
        ).alias("last_pack"),
    )
    g = {r["doc_id"]: r for r in got.collect()}
    for r in naive.collect():
        gr = g[r["doc_id"]]
        assert (gr["start_offset"], gr["first_pack"], gr["last_pack"]) == (
            r["start_offset"],
            r["first_pack"],
            r["last_pack"],
        )
    assert g[13]["n_packs"] == 0 and g[13]["first_pack"] is None


def test_pack_sequences_boundary_spans(spark):
    d = spark.createDataFrame(
        [(0, 100), (1, 50), (2, 10)], "doc_id int, n_tok int"
    )
    g = {r["doc_id"]: r for r in pack_sequences(d, seq_len=64, tokens_col="n_tok").collect()}
    # doc 0: tokens 0..99 -> packs 0..1; doc 1: 100..149 -> packs 1..2
    assert (g[0]["first_pack"], g[0]["last_pack"], g[0]["n_packs"]) == (0, 1, 2)
    assert (g[1]["first_pack"], g[1]["last_pack"], g[1]["n_packs"]) == (1, 2, 2)
    assert (g[2]["first_pack"], g[2]["last_pack"], g[2]["n_packs"]) == (2, 2, 1)
