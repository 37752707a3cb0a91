"""Incrementally-maintained LSH near-dup index (operators/neardup_index.py).

Contract: the posting table is a 1->N fan-out replica of the corpus —
after sync() it holds exactly ``bands`` rows per live corpus doc with
the same (band, bh) keys batch LSH would compute; probing a new batch
against the index equals running batch LSH against the corpus state;
churn maintains it at O(changed docs) with deletes dropping postings.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbp_etl_spark.cdc.merge import merge_batch
from dbp_etl_spark.lake import LakeTable, TableSchema
from dbp_etl_spark.operators.dedup_ops import lsh_band_rows
from dbp_etl_spark.operators.neardup_index import NearDupIndex

CORPUS = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
    ]
)


def _text(family: int, variant: int) -> str:
    # 30 family tokens; a variant flips one token -> high-but-<1 jaccard
    toks = [f"w{family}x{j}" for j in range(30)]
    if variant:
        toks[7] = f"v{variant}"
    return " ".join(toks)


def _events(spark, rows, batch_id):
    return spark.createDataFrame(
        [(u, ts, txt, op, batch_id) for (u, ts, txt, op) in rows],
        "url string, warc_ts_s long, text string, op string, batch_id string",
    ).select(
        "url",
        F.timestamp_seconds(F.col("warc_ts_s")).alias("warc_ts"),
        F.when(F.col("op") != "delete", F.encode(F.coalesce("text", F.lit("")), "utf-8")).alias("html"),
        "text",
        "op",
        "batch_id",
    )


def _tf(d):
    # merge transform contract: derive payload-dependent columns (text)
    return d.withColumn("text", F.decode(F.col("html"), "utf-8"))


def mk_corpus(spark, tmp_path, n_docs=20, **kw):
    t = LakeTable.create(
        spark,
        str(tmp_path / "corpus"),
        TableSchema.from_struct(CORPUS),
        key="url",
        num_buckets=4,
        **kw,
    )
    rows = [(f"u{i}", 1700000000 + i, _text(i % 5, 0), "update") for i in range(n_docs)]
    merge_batch(t, _events(spark, rows, "b1"), "b1", transform=_tf)
    return t.refresh()


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("lshidx")
    corpus = mk_corpus(spark, tmp)
    idx = NearDupIndex.build(corpus, str(tmp / "index"), num_buckets=4)
    return corpus, idx


def test_index_matches_batch_lsh(built):
    corpus, idx = built
    got = sorted(
        (r["doc"], r["band"], r["bh"])
        for r in idx.index.read().select("doc", "band", "bh").collect()
    )
    state = corpus.read().select("url", "text")
    want = sorted(
        (r["url"], r["band"], r["bh"])
        for r in lsh_band_rows(state, id_col="url").collect()
    )
    assert got == want and len(got) == 20 * 4


def test_probe_equals_batch_lsh_against_state(spark, built):
    corpus, idx = built
    batch = spark.createDataFrame(
        [("p0", _text(2, 1)), ("p1", _text(4, 2)), ("p2", "zz qq rr ss tt uu vv ww")],
        ["probe_id", "text"],
    )
    got = sorted(
        (r["probe_id"], r["doc"], r["jaccard"])
        for r in idx.near_dups_of(batch, threshold=0.3).collect()
    )
    # contract: identical result to BATCH LSH over (corpus state ∪ batch),
    # restricted to cross pairs — same hashes, same bands, same recall
    from dbp_etl_spark.operators.dedup_ops import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    union = corpus.read().select(F.col("url").alias("doc_id"), "text").unionByName(
        batch.select(F.col("probe_id").alias("doc_id"), "text")
    )
    cands = minhash_lsh_candidates(union).filter(
        F.col("id_a").startswith("p") != F.col("id_b").startswith("p")
    )
    want = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        if r["id_a"].startswith("p")
        else (r["id_b"], r["id_a"], r["jaccard"])
        for r in ngram_jaccard_pairs(union, cands, threshold=0.3).collect()
    )
    assert got == want and len(got) > 0
    # an unrelated probe never verifies
    assert all(p != "p2" for p, _, _ in got)
    assert all(0.3 <= j <= 1.0 for _, _, j in got)


def test_churn_updates_index_incrementally(spark, built):
    corpus, idx = built
    # u2 rewritten into family 3's text; u7 deleted
    rows = [
        ("u2", 1800000000, _text(3, 0), "update"),
        ("u7", 1800000001, None, "delete"),
    ]
    merge_batch(corpus.refresh(), _events(spark, rows, "b2"), "b2", transform=_tf)
    res = idx.sync()
    assert res.mode == "cdf" and not res.skipped
    # O(churn): 2 changed docs x 4 bands
    assert res.counts["upsert"] == 4 and res.counts["delete"] == 4
    # replay is exactly-once
    assert idx.sync().skipped

    post = idx.index.read().select("doc", "band", "bh")
    assert post.filter(F.col("doc") == "u7").count() == 0
    state = idx.source.read().select("url", "text")
    want = sorted(
        (r["url"], r["band"], r["bh"])
        for r in lsh_band_rows(state, id_col="url").collect()
    )
    got = sorted((r["doc"], r["band"], r["bh"]) for r in post.collect())
    assert got == want

    # probing family 2 no longer returns u2; family 3 now does
    batch = spark.createDataFrame(
        [("q2", _text(2, 1)), ("q3", _text(3, 3))], ["probe_id", "text"]
    )
    got = sorted(
        (r["probe_id"], r["doc"])
        for r in idx.near_dups_of(batch, threshold=0.3).collect()
    )
    assert ("q2", "u2") not in got and ("q2", "u7") not in got
    assert ("q3", "u2") in got


def test_open_recovers_handle_and_cursor(spark, built):
    corpus, idx = built
    reopened = NearDupIndex.open(idx.source, idx.index)
    assert reopened.sync().skipped  # cursor recovered from the ledger
    assert reopened.bands == 4 and reopened.hash_fn == "xxhash64"


def test_streaming_tail_maintains_index(spark, tmp_path):
    """tail() drives the same fan-out apply from the lake_cdf stream:
    postings equal batch LSH of the final state, and the batch sync()
    ledger sees the stream's work (interchangeable modes)."""
    corpus = mk_corpus(spark, tmp_path, changelog=True)
    idx = NearDupIndex.build(corpus, str(tmp_path / "index"), num_buckets=4)
    merge_batch(
        corpus.refresh(),
        _events(spark, [("u3", 1800000000, _text(1, 5), "update")], "b2"),
        "b2",
        transform=_tf,
    )
    merge_batch(
        corpus.refresh(),
        _events(spark, [("u5", 1800000100, None, "delete")], "b3"),
        "b3",
        transform=_tf,
    )
    idx.refresh()
    q = idx.tail(str(tmp_path / "ck"))
    q.awaitTermination(180)
    q.stop()
    idx.refresh()

    state = idx.source.read().select("url", "text")
    want = sorted(
        (r["url"], r["band"], r["bh"])
        for r in lsh_band_rows(state, id_col="url").collect()
    )
    got = sorted(
        (r["doc"], r["band"], r["bh"])
        for r in idx.index.read().select("doc", "band", "bh").collect()
    )
    assert got == want
    assert idx.index.read().filter(F.col("doc") == "u5").count() == 0
    # the stream advanced the shared ledger cursor: batch sync is a noop
    assert idx.sync().skipped


def test_cow_index_parity_with_mor(spark, tmp_path):
    """The fan-out apply's copy-on-write branch (merge_on_read=False)
    produces the same postings as the MOR default across churn."""
    corpus = mk_corpus(spark, tmp_path)
    idx = NearDupIndex.build(
        corpus, str(tmp_path / "index_cow"), num_buckets=4, merge_on_read=False
    )
    rows = [
        ("u1", 1800000000, _text(4, 9), "update"),
        ("u6", 1800000001, None, "delete"),
    ]
    merge_batch(corpus.refresh(), _events(spark, rows, "b2"), "b2", transform=_tf)
    res = idx.sync()
    assert res.mode == "cdf" and res.counts == {"upsert": 4, "delete": 4, "buckets": res.counts["buckets"]}
    state = idx.source.read().select("url", "text")
    want = sorted(
        (r["url"], r["band"], r["bh"])
        for r in lsh_band_rows(state, id_col="url").collect()
    )
    got = sorted(
        (r["doc"], r["band"], r["bh"])
        for r in idx.index.read().select("doc", "band", "bh").collect()
    )
    assert got == want
    assert not idx.index.manifest.get("merge_on_read")
