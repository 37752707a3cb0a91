"""Operator-level tests: near-dup family, similarity, windows, multimodal."""

import math

import pytest
from pyspark.sql import functions as F

from dbp_etl_spark.operators import (
    asof_join,
    brute_force_topk,
    exact_dedup,
    extract_image_features,
    lsh_bucketed_topk,
    merge_overlapping_ranges,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    sample_audio_frames,
    sessionize,
    simhash,
    simhash_near_dups,
)

DOC_A = "the quick brown fox jumps over the lazy dog and runs far away today"
DOC_A2 = "the quick brown fox jumps over the lazy dog and runs far away tonight"  # near-dup of A
DOC_B = "completely different content about spark query engines and column stores"
DOC_C = "another unrelated text mentioning databases tables and distributed joins"


@pytest.fixture()
def docs(spark):
    rows = [(0, DOC_A), (1, DOC_A2), (2, DOC_B), (3, DOC_C), (4, DOC_A)]  # 4 = exact dup of 0
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = {r["keeper"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 4 identical
    assert out[1] == 1 and out[2] == 1 and out[3] == 1


def test_minhash_signatures_deterministic(spark, docs):
    s1 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    s2 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs.repartition(7)).collect()}
    assert s1 == s2
    assert s1[0] == s1[4]  # identical docs -> identical signature
    assert len(s1[0]) == 16


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(docs).collect()}
    assert (0, 4) in pairs  # exact dup always collides
    assert (0, 1) in pairs or (1, 4) in pairs  # near-dup should collide in >=1 band
    # verification stage: exact jaccard confirms, unrelated pairs score low
    verified = ngram_jaccard_pairs(docs, minhash_lsh_candidates(docs), threshold=0.5)
    vp = {(r["id_a"], r["id_b"]): r["jaccard"] for r in verified.collect()}
    assert vp[(0, 4)] == 1.0
    assert all(a != 2 and b != 2 for (a, b) in vp)  # DOC_B unrelated


def test_simhash_near_dups(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[0] == sh[4]
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sh[0], sh[1]) < ham(sh[0], sh[2])  # near-dup closer than unrelated
    dups = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_near_dups(docs, max_hamming=7).collect()}
    assert dups[(0, 4)] == 0
    assert (0, 1) in dups  # hamming(0,1)=6 < n_chunks=8 -> guaranteed found


def test_brute_force_topk_exact(spark):
    # hand-built vectors: q matches v1 best, then v2
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0]), (3, [0.0, 1.0, 0.0]), (4, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    probes = spark.createDataFrame([(100, [1.0, 0.05, 0.0])], "qid long, qe array<float>")
    out = brute_force_topk(corpus, probes, k=2).collect()
    assert [r["cid"] for r in out] == [1, 2]
    expect = (1.0) / (math.sqrt(1 + 0.05**2))
    assert abs(out[0]["cos_sim"] - round(expect, 3)) < 1e-9


def test_lsh_topk_approximates_bruteforce(spark):
    import random

    rnd = random.Random(42)
    base = [[rnd.gauss(0, 1) for _ in range(16)] for _ in range(50)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = spark.createDataFrame(
        [(i, v) for i, v in rows[:3]], "qid long, qe array<float>"
    )
    exact = brute_force_topk(corpus, probes, k=3).collect()
    approx = lsh_bucketed_topk(corpus, probes, dim=16, k=3, n_planes=2).collect()
    exact_top = {r["qid"]: r["cid"] for r in exact if True}
    # with 2 planes (4 buckets) recall should be decent: each probe finds itself-adjacent vecs
    approx_by_q = {}
    for r in approx:
        approx_by_q.setdefault(r["qid"], []).append(r["cid"])
    assert set(approx_by_q) == {0, 1, 2}
    # determinism across partitionings
    approx2 = lsh_bucketed_topk(corpus.repartition(5), probes, dim=16, k=3, n_planes=2).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, approx2))


def test_sessionize(spark):
    rows = [("u", 0), ("u", 100), ("u", 4000), ("u", 4100), ("v", 50)]
    df = spark.createDataFrame(rows, "k string, t long").select(
        "k", F.timestamp_seconds("t").alias("ts")
    )
    out = sessionize(df, "k", "ts", gap_seconds=1000)
    got = {(r["k"], r["ts"].timestamp()): r["session_id"] for r in out.collect()}
    assert got[("u", 0)] == got[("u", 100)] == 1
    assert got[("u", 4000)] == got[("u", 4100)] == 2
    assert got[("v", 50)] == 1


def test_merge_overlapping_ranges(spark):
    rows = [("b", 1, 5), ("b", 4, 8), ("b", 10, 12), ("b", 12, 14), ("c", 1, 2)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = {(r["k"], r["span_start"], r["span_end"]): r["n_merged"] for r in merge_overlapping_ranges(df, "k", "s", "e").collect()}
    assert out[("b", 1, 8)] == 2
    assert out[("b", 10, 14)] == 2
    assert out[("c", 1, 2)] == 1


def test_asof_join_backward(spark):
    quotes = spark.createDataFrame(
        [("A", 10, 1.0), ("A", 20, 2.0), ("A", 30, 3.0), ("B", 15, 9.0)],
        "sym string, t long, px double",
    ).select("sym", F.timestamp_seconds("t").alias("qts"), "px")
    trades = spark.createDataFrame(
        [("A", 25), ("A", 20), ("A", 5), ("B", 100)], "sym string, t long"
    ).select("sym", F.timestamp_seconds("t").alias("tts"))
    out = asof_join(trades, quotes, key="sym", left_ts="tts", right_ts="qts", right_cols=["px"])
    got = {(r["sym"], r["tts"].timestamp()): r["px"] for r in out.collect()}
    assert got[("A", 25)] == 2.0
    assert got[("A", 20)] == 2.0  # equal ts counts (<=)
    assert got[("A", 5)] is None  # nothing before
    assert got[("B", 100)] == 9.0


def test_image_features_stub_plumbing(spark):
    # mimes with no in-repo codec (PPM/PNG/JPEG/GIF now decode for
    # real — see the dedicated codec tests)
    media = spark.createDataFrame(
        [(1, b"imagebytes1", "image/avif", 10, 10), (2, b"imagebytes2", "image/webp", 20, 20)],
        "media_id long, content binary, mime string, width int, height int",
    )
    out = extract_image_features(media, deterministic_fake=True).collect()
    got = {r["media_id"]: r for r in out}
    assert got[1]["n_bytes"] == 11
    assert len(got[1]["feature"]) == 8
    # deterministic across runs
    out2 = extract_image_features(media.repartition(3), deterministic_fake=True).collect()
    assert {r["media_id"]: list(r["feature"]) for r in out2} == {
        r["media_id"]: list(r["feature"]) for r in out
    }
    # real decode is an explicit stub
    with pytest.raises(Exception, match="NotImplementedError|image decoding"):
        extract_image_features(media, deterministic_fake=False).collect()


def test_audio_frame_sampling_stub(spark):
    media = spark.createDataFrame(
        [(1, bytes(range(100)))], "media_id long, content binary"
    )
    out = sample_audio_frames(media, frames_per_item=4, deterministic_fake=True).collect()
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert len({r["frame_hash"] for r in out}) == 4


def test_md5_mode_minhash_matches_xxhash_semantics(spark, docs):
    """md5_60 hashing changes hash values, not semantics: exact dups
    always collide, signatures are deterministic across partitioning."""
    from dbp_etl_spark.operators.dedup_ops import minhash_lsh_candidates, minhash_signatures

    s1 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs, hash_fn="md5_60").collect()}
    s2 = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(docs.repartition(5), hash_fn="md5_60").collect()
    }
    assert s1 == s2
    assert s1[0] == s1[4]
    assert all(v >= 0 for v in s1[0]), "60-bit md5 hashes must stay positive"
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(docs, hash_fn="md5_60").collect()}
    assert (0, 4) in pairs


def test_simhash32x2_matches_simhash_semantics(spark, docs):
    """Two-half md5 simhash: identical docs -> hamming 0; near-dups
    closer than unrelated; pigeonhole join finds hamming<8 pairs."""
    from dbp_etl_spark.operators.dedup_ops import simhash32x2, simhash32x2_near_dups

    sh = {r["doc_id"]: (r["sh_lo"], r["sh_hi"]) for r in simhash32x2(docs).collect()}
    assert sh[0] == sh[4]
    assert all(0 <= lo < 2**32 and 0 <= hi < 2**32 for lo, hi in sh.values())

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    assert ham(sh[0], sh[1]) < ham(sh[0], sh[2])
    dups = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash32x2_near_dups(docs, max_hamming=7).collect()
    }
    assert dups[(0, 4)] == 0
    if ham(sh[0], sh[1]) <= 7:
        assert (0, 1) in dups  # guaranteed recall below n_chunks


def test_formula_sketch_buckets_and_topk(spark):
    """Formula-plane LSH: bucket of a vector is deterministic, identical
    vectors share a bucket, and top-k within bucket ranks by cosine."""
    import random

    from dbp_etl_spark.operators.similarity import lsh_bucketed_topk

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    near = [x + 0.01 for x in base]
    rows = [(0, base), (1, near), (2, [rng.uniform(-1, 1) for _ in range(16)])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = corpus.filter("vec_id = 0").selectExpr("vec_id as qid", "embedding as qe")
    out = lsh_bucketed_topk(corpus, probes, dim=16, k=2, n_planes=2, planes="formula").collect()
    got = {r["cid"]: r["cos_sim"] for r in out}
    assert 1 in got and got[1] > 0.99  # near-identical vector found first


def test_asof_join_forward(spark):
    """Forward as-of: earliest right row with right_ts >= left_ts,
    equal-ts rows qualify; no match -> NULL."""
    from dbp_etl_spark.operators.windows import asof_join

    left = spark.createDataFrame(
        [("k", 10), ("k", 25), ("k", 99)], "key string, t long"
    ).select("key", F.timestamp_seconds("t").alias("lts"))
    right = spark.createDataFrame(
        [("k", 10, "a"), ("k", 20, "b"), ("k", 30, "c")], "key string, t long, v string"
    ).select("key", F.timestamp_seconds("t").alias("rts"), "v")
    out = asof_join(left, right, "key", "lts", "rts", ["v"], direction="forward")
    got = {r["lts"].second + r["lts"].minute * 60: r["v"] for r in out.collect()}
    assert got[10] == "a"   # equal ts qualifies
    assert got[25] == "c"   # next at 30
    assert got[99] is None  # nothing after


def test_ppm_decode_resize_features_real(spark):
    """Multimodal image path with a REAL codec (pure-numpy PPM): decode
    -> resize -> feature extraction, end-to-end through mapInPandas."""
    import numpy as np

    from dbp_etl_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        extract_image_features,
        resize_images,
    )

    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:, :3] = [255, 0, 0]   # left half red
    px[:, 3:] = [0, 0, 255]   # right half blue
    content = encode_ppm(px)
    assert (decode_ppm(content) == px).all()  # codec roundtrip

    media = spark.createDataFrame(
        [(1, bytearray(content), "image/x-portable-pixmap", 6, 4)],
        "media_id long, content binary, mime string, width int, height int",
    )
    small = resize_images(media, out_w=2, out_h=2).collect()[0]
    spx = decode_ppm(bytes(small["content"]))
    assert spx.shape == (2, 2, 3)
    assert (spx[:, 0] == [255, 0, 0]).all() and (spx[:, 1] == [0, 0, 255]).all()

    feat = extract_image_features(media).collect()[0]["feature"]
    assert len(feat) == 10
    assert abs(feat[0] - 0.5) < 1e-6  # mean red = half the image
    assert abs(feat[1] - 0.0) < 1e-6  # no green anywhere
    # quadrant gray means: left quadrants brighter == right (symmetric)
    assert abs(feat[6] - feat[8]) < 1e-6


def test_wav_decode_and_energy_real(spark):
    """Multimodal audio path with a REAL codec (stdlib wave): decode ->
    windowed RMS energy; silent half vs loud half separate cleanly."""
    import numpy as np

    from dbp_etl_spark.operators.multimodal import (
        audio_frame_energy,
        decode_wav,
        encode_wav,
        sample_audio_frames,
    )

    loud = (np.sin(np.linspace(0, 200 * np.pi, 8000)) * 20000).astype(np.int16)
    silent = np.zeros(8000, dtype=np.int16)
    content = encode_wav(np.concatenate([silent, loud]))
    samples, rate = decode_wav(content)
    assert rate == 16000 and len(samples) == 16000

    media = spark.createDataFrame(
        [(7, bytearray(content))], "media_id long, content binary"
    )
    rows = {r["frame_idx"]: r for r in audio_frame_energy(media, frames_per_item=2).collect()}
    assert rows[0]["rms"] < 1e-9          # silent first half
    assert rows[1]["rms"] > 0.3           # loud second half
    assert rows[0]["n_samples"] == 8000
    # frame sampling goes through the real decode path for WAV (no fake flag)
    frames = sample_audio_frames(media, frames_per_item=4).collect()
    assert len(frames) == 4 and len({f["frame_hash"] for f in frames}) >= 2


def test_ivf_topk_trained_recall(spark):
    """IVF with trained centroids: deterministic across partitionings,
    recall vs brute force reasonable at nprobe=2/8 cells."""
    import random

    from dbp_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)])
        for i in range(60)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = corpus.filter("vec_id < 3").selectExpr("vec_id as qid", "embedding as qe")

    c1 = {r["centroid_id"]: r["centroid"] for r in kmeans_centroids(corpus, 8, k=4, iterations=2).collect()}
    c2 = {
        r["centroid_id"]: r["centroid"]
        for r in kmeans_centroids(corpus.repartition(7), 8, k=4, iterations=2).collect()
    }
    assert c1 == c2, "kmeans must be deterministic across partitionings"

    exact = brute_force_topk(corpus, probes, k=3)
    approx = ivf_topk(corpus, probes, dim=8, k=3, n_cells=4, nprobe=2, train_iterations=2)
    exact_set = {(r["qid"], r["cid"]) for r in exact.collect()}
    approx_set = {(r["qid"], r["cid"]) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    assert all(len([1 for q, _ in approx_set if q == p]) == 3 for p in (0, 1, 2))


def test_assign_global_sequence_null_coarse_key(spark):
    """NULL coarse-key rows form one bucket sorting FIRST (mirrors the
    naive window's nulls-first default) instead of crashing."""
    from pyspark.sql import Window

    from dbp_etl_spark.operators.windows import assign_global_sequence

    df = spark.createDataFrame(
        [(None, 1), (None, 2), ("b1", 3), ("b2", 4)], "ck string, k long"
    )
    out = assign_global_sequence(df, ["ck", "k"], coarse_key=F.col("ck"))
    naive = df.select(
        "k", F.row_number().over(Window.orderBy("ck", "k")).cast("long").alias("seq")
    )
    assert sorted(map(tuple, out.select("k", "seq").collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_audio_energy_null_payload(spark):
    """A NULL audio payload yields zero-energy windows, not a crash."""
    from dbp_etl_spark.operators.multimodal import audio_frame_energy

    media = spark.createDataFrame([(9, None)], "media_id long, content binary")
    rows = audio_frame_energy(media, frames_per_item=2).collect()
    assert len(rows) == 2 and all(r["rms"] == 0.0 and r["n_samples"] == 0 for r in rows)


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunking invariants: every token appears in >=1 chunk, adjacent
    chunks overlap by exactly `overlap`, short docs yield 1 chunk."""
    docs = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(26))), (1, "a b c")],
        "doc_id long, text string",
    )
    from dbp_etl_spark.operators.derive import chunk_documents

    out = chunk_documents(docs, chunk_tokens=5, overlap=1)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in out.collect())
    )
    d0 = [t for d, _, t in rows if d == 0]
    assert len(d0) == 7  # ceil((26-1)/4)
    # full coverage, no empty chunks
    covered = set()
    for c in d0:
        toks = c.split(" ")
        assert 1 <= len(toks) <= 5 and all(toks)
        covered.update(toks)
    assert covered == {f"t{i}" for i in range(26)}
    # exact overlap between consecutive chunks
    assert d0[0].split(" ")[-1] == d0[1].split(" ")[0]
    d1 = [t for d, _, t in rows if d == 1]
    assert d1 == ["a b c"]  # short doc -> single chunk


def test_png_codec_roundtrip_all_filters(spark):
    """Pure-python PNG decode inverts every scanline filter (None/Sub/
    Up/Average/Paeth) for gray, RGB and RGBA — real pixels, no PIL."""
    import numpy as np

    from dbp_etl_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(42)
    for ch in (1, 3, 4):
        px = rng.randint(0, 256, size=(13, 17, ch), dtype=np.uint8)
        for filt in range(5):
            out = decode_png(encode_png(px, filter_type=filt))
            assert out.shape == (13, 17, ch), (ch, filt)
            assert np.array_equal(out, px), (ch, filt)


def test_png_features_and_resize_real(spark):
    """PNG flows through the Arrow-batched image operators with REAL
    decode (no deterministic_fake): features over actual pixels, resize
    re-encodes PNG bytes."""
    import numpy as np

    from dbp_etl_spark.operators.multimodal import (
        IMAGE_SCHEMA,
        decode_png,
        encode_png,
        extract_image_features,
        resize_images,
    )

    solid = np.zeros((8, 8, 3), np.uint8)
    solid[:, :, 0] = 200  # red-ish: mean R = 200/255
    grad = np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))[..., None].repeat(3, 2)
    rows = [
        (1, bytearray(encode_png(solid, filter_type=4)), "image/png", 8, 8),
        (2, bytearray(encode_png(grad, filter_type=2)), "image/png", 16, 16),
    ]
    media = spark.createDataFrame(rows, IMAGE_SCHEMA)

    feats = {r["media_id"]: r["feature"] for r in extract_image_features(media).collect()}
    assert abs(feats[1][0] - 200 / 255) < 1e-6  # mean R channel, real pixels
    assert abs(feats[1][1] - 0.0) < 1e-6  # mean G
    assert feats[1][3] < 1e-6  # solid image: zero channel std
    assert feats[2][3] > 0.01  # gradient image: real variance seen
    resized = {r["media_id"]: r for r in resize_images(media, 4, 4).collect()}
    assert resized[1]["mime"] == "image/png"
    px = decode_png(bytes(resized[2]["content"]))
    assert px.shape == (4, 4, 3)


def test_png_unsupported_shape_raises(spark):
    from dbp_etl_spark.operators.multimodal import decode_png, encode_png
    import numpy as np
    import pytest as _pytest
    import struct
    import zlib

    # corrupt IHDR to 16-bit depth: must refuse loudly, not garbage out
    good = encode_png(np.zeros((4, 4, 3), np.uint8))
    ihdr_at = good.index(b"IHDR") - 4
    body = bytearray(good[ihdr_at + 8 : ihdr_at + 8 + 13])
    body[8] = 16  # bit depth
    tag_body = b"IHDR" + bytes(body)
    patched = (
        good[:ihdr_at]
        + struct.pack(">I", 13)
        + tag_body
        + struct.pack(">I", zlib.crc32(tag_body) & 0xFFFFFFFF)
        + good[ihdr_at + 8 + 13 + 4 :]
    )
    with _pytest.raises(NotImplementedError):
        decode_png(bytes(patched))


def test_assign_global_sequence_join_fallback_matches_map(spark):
    """Above the create_map inline threshold the offsets ship as a
    broadcast join; result must be identical to the inline-map path."""
    from dbp_etl_spark.operators.windows import assign_global_sequence

    df = spark.range(500).select(
        F.col("id"), (F.col("id") % 37).alias("g"), (F.col("id") * 7 % 101).alias("v")
    )
    inline = assign_global_sequence(df, [F.col("id")], F.col("g"))
    joined = assign_global_sequence(df, [F.col("id")], F.col("g"), map_inline_max=1)
    a = sorted((r["id"], r["seq"]) for r in inline.collect())
    b = sorted((r["id"], r["seq"]) for r in joined.collect())
    assert a == b
    # sequence is a permutation of 1..N
    assert sorted(s for _, s in a) == list(range(1, 501))


def test_jpeg_codec_roundtrips(spark):
    """Pure-python baseline JPEG: encode->decode round trips within the
    DCT rounding bound at quant=1 for grayscale, RGB 4:4:4 (including
    non-multiple-of-8 dims) and RGB 4:2:0."""
    import numpy as np

    from dbp_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(7)
    g = rng.randint(0, 256, (24, 17, 1), np.uint8)
    out = decode_jpeg(encode_jpeg(g, quant=1))
    assert out.shape == (24, 17, 1)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 3

    c = rng.randint(0, 256, (19, 23, 3), np.uint8)
    out = decode_jpeg(encode_jpeg(c, quant=1))
    assert out.shape == (19, 23, 3)
    assert np.abs(out.astype(int) - c.astype(int)).max() <= 4  # + colorspace rounding

    xx, yy = np.meshgrid(np.arange(33), np.arange(25))
    smooth = np.stack([(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], -1).astype(
        np.uint8
    )
    out = decode_jpeg(encode_jpeg(smooth, quant=1, subsample=True))
    assert out.shape == smooth.shape
    # chroma is 2x2-averaged: luma-dominated mean error stays small
    assert np.abs(out.astype(int) - smooth.astype(int)).mean() < 4

    # lossy-but-sane at a realistic quant
    out = decode_jpeg(encode_jpeg(smooth, quant=16))
    assert np.abs(out.astype(int) - smooth.astype(int)).mean() < 10


def test_jpeg_rejects_non_baseline(spark):
    import pytest as _pytest

    from dbp_etl_spark.operators.jpeg import decode_jpeg

    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # arithmetic-coded SOF9 must refuse loudly (SOF0/SOF2 are supported)
    import numpy as np
    from dbp_etl_spark.operators.jpeg import encode_jpeg

    good = bytearray(encode_jpeg(np.zeros((8, 8, 1), np.uint8)))
    sof_at = bytes(good).find(b"\xff\xc0")
    good[sof_at + 1] = 0xC9
    with _pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(good))


def test_jpeg_flows_through_image_operators(spark):
    """JPEG through the Arrow-batched operators with REAL decode: mean
    features track actual pixels; resize re-encodes JPEG bytes."""
    import numpy as np

    from dbp_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from dbp_etl_spark.operators.multimodal import (
        IMAGE_SCHEMA,
        extract_image_features,
        resize_images,
    )

    solid = np.zeros((16, 16, 3), np.uint8)
    solid[:, :, 2] = 180  # blue-ish
    media = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(solid, quant=1)), "image/jpeg", 16, 16)], IMAGE_SCHEMA
    )
    feats = extract_image_features(media).collect()[0]["feature"]
    assert abs(feats[2] - 180 / 255) < 0.02  # mean B from real pixels
    assert feats[0] < 0.02 and feats[1] < 0.02
    resized = resize_images(media, 8, 8).collect()[0]
    assert resized["mime"] == "image/jpeg"
    px = decode_jpeg(bytes(resized["content"]))
    assert px.shape == (8, 8, 3)
    assert abs(int(px[..., 2].mean()) - 180) <= 6


def test_y4m_video_codec_and_frame_sampling(spark):
    """Real video path: Y4M round trip (C444 exact, C420 lossy-small)
    and frame sampling over actually-decoded frames."""
    import numpy as np

    from dbp_etl_spark.operators.multimodal import (
        decode_y4m,
        encode_y4m,
        sample_video_frames,
    )

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (6, 16, 20, 3), np.uint8)
    dec, fps = decode_y4m(encode_y4m(frames, fps=30))
    assert dec.shape == frames.shape and fps == 30
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 2  # colorspace rounding

    # 4:2:0 on SMOOTH content (random noise is chroma-subsampling's
    # worst case by construction): small mean error
    xx, yy = np.meshgrid(np.arange(20), np.arange(16))
    smooth1 = np.stack([(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256], -1).astype(
        np.uint8
    )
    smooth = np.stack([smooth1, 255 - smooth1], 0)
    dec420, _ = decode_y4m(encode_y4m(smooth, c420=True))
    assert dec420.shape == smooth.shape
    assert np.abs(dec420.astype(int) - smooth.astype(int)).mean() < 8

    media = spark.createDataFrame(
        [(7, bytearray(encode_y4m(frames, fps=30)))], "media_id long, content binary"
    )
    out = sample_video_frames(media, frames_per_item=3).collect()
    assert [r["frame_idx"] for r in out] == [0, 2, 5]  # evenly spaced incl. endpoints
    assert all(r["n_frames"] == 6 and r["fps"] == 30 for r in out)
    # per-frame means track the real pixels
    expect = frames[0].mean(axis=(0, 1))
    got = out[0]["mean_rgb"]
    assert all(abs(g - e) < 2 for g, e in zip(got, expect))
    # distinct frames -> distinct hashes
    assert len({r["frame_hash"] for r in out}) == 3

    # compressed container without fake -> loud stub
    import pytest as _pytest

    bad = spark.createDataFrame([(1, b"\x00\x00\x00 ftypmp42")], "media_id long, content binary")
    with _pytest.raises(Exception, match="ffmpeg"):
        sample_video_frames(bad).collect()


def test_jpeg_restart_markers(spark):
    """DRI/RSTm: the encoder emits restart markers, the decoder
    byte-aligns and resets DC prediction at each — round trip intact."""
    import numpy as np

    from dbp_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 40, 3), np.uint8)  # 15 MCUs at 4:4:4
    data = encode_jpeg(img, quant=1, restart_interval=4)
    assert b"\xff\xdd" in data  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    out = decode_jpeg(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
