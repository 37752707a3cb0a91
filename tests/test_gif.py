"""GIF codec (operators/gif.py): LZW, palettes, interlace, animation,
and the Spark multimodal integration."""

import random
import struct

import numpy as np
import pytest

from dbp_etl_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_first_frame,
    encode_gif,
)


def frames_rgb(n=3, h=17, w=23, colors=5, seed=7):
    rng = np.random.RandomState(seed)
    return (rng.randint(0, colors, (n, h, w, 1)) * 41 % 256).astype(np.uint8).repeat(
        3, axis=3
    )


def test_lzw_roundtrip_fuzz():
    rng = random.Random(1)
    for _ in range(60):
        n_sym = rng.choice([4, 16, 256])
        mcs = max(2, (n_sym - 1).bit_length())
        seq = [rng.randrange(n_sym) for _ in range(rng.randrange(1, 4000))]
        assert _lzw_decode(_lzw_encode(seq, mcs), mcs, len(seq)) == seq


def test_gif_roundtrip_multiframe():
    fr = frames_rgb()
    out, fps = decode_gif(encode_gif(fr))
    assert out.shape == fr.shape and (out == fr).all()
    assert fps == 10  # delay 10cs -> 10 fps


def test_gif_interlaced_roundtrip():
    fr = frames_rgb(n=1, h=29, w=13)
    out, _ = decode_gif(encode_gif(fr[0], interlace=True))
    assert (out[0] == fr[0]).all()


def test_gif_dictionary_growth_and_reset():
    # enough distinct 2-grams to push the dictionary past 2^12 entries
    rng = np.random.RandomState(3)
    big = (rng.randint(0, 128, (1, 120, 130, 1)).astype(np.uint8) * 2).repeat(3, axis=3)
    out, _ = decode_gif(encode_gif(big))
    assert (out == big).all()


def test_gif_transparency_keeps_canvas():
    # frame 2 paints color index 1 transparent: those pixels must show
    # frame 1's pixels underneath
    a = np.zeros((4, 4, 3), np.uint8)
    a[:, :] = (200, 0, 0)
    b = np.zeros((4, 4, 3), np.uint8)
    b[:2, :] = (0, 200, 0)  # rest will be the transparent color
    fr = np.stack([a, b])
    colors = sorted({tuple(px) for f in fr for px in f.reshape(-1, 3)})
    t_idx = colors.index((0, 0, 0))
    out, _ = decode_gif(encode_gif(fr, transparent_index=t_idx))
    assert (out[0] == a).all()
    assert (out[1][:2] == (0, 200, 0)).all()
    assert (out[1][2:] == (200, 0, 0)).all()  # transparent kept frame 1


def test_gif_truncation_and_corruption_raise():
    g = encode_gif(frames_rgb(n=1))
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + g[6:])
    with pytest.raises(ValueError):
        decode_gif(g[: len(g) // 2])  # truncated mid-stream
    # palette index out of range: craft a 2-color image then shrink GCT
    with pytest.raises(ValueError):
        bad = bytearray(g)
        bad[10] = (bad[10] & 0xF8) | 0x07  # claim a 256-entry GCT
        decode_gif(bytes(bad[:13]) + b"\x00" * (256 * 3) + b"\x3b")


def test_gif_disposal_restore_background():
    # disposal 2 after frame 1: frame 2's canvas outside its rect is bg
    fr = frames_rgb(n=1, h=6, w=6)
    g = bytearray(encode_gif(np.stack([fr[0], fr[0]])))
    # patch both graphic-control disposal fields to 'restore background'
    i = g.find(b"\x21\xf9\x04")
    while i != -1:
        g[i + 3] |= 0x08  # disposal = 2
        i = g.find(b"\x21\xf9\x04", i + 1)
    out, _ = decode_gif(bytes(g))
    assert (out[0] == fr[0]).all()  # first frame unaffected
    # second frame: full-canvas image paints over restored bg, so equal
    assert (out[1] == fr[0]).all()


def test_spark_image_features_on_gif(spark):
    from dbp_etl_spark.operators.multimodal import (
        extract_image_features,
        resize_images,
    )

    fr = frames_rgb(n=1, h=10, w=12)
    rows = [(1, bytearray(encode_gif(fr[0])), "image/gif", 12, 10)]
    df = spark.createDataFrame(
        rows, "media_id long, content binary, mime string, width int, height int"
    )
    feats = extract_image_features(df).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) > 0
    # features must come from real pixels: they match the PPM-path
    # features of the same pixel array
    from dbp_etl_spark.operators.multimodal import _ppm_features

    assert feats[0]["feature"] == pytest.approx(_ppm_features(fr[0]), abs=1e-6)

    resized = resize_images(df, 6, 5).collect()[0]
    assert resized["mime"] == "image/gif"
    px = decode_gif_first_frame(bytes(resized["content"]))
    assert px.shape == (5, 6, 3)


def test_spark_video_frames_on_animated_gif(spark):
    from dbp_etl_spark.operators.multimodal import sample_video_frames

    fr = frames_rgb(n=6, h=8, w=8)
    rows = [(7, bytearray(encode_gif(fr)))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = sample_video_frames(df, frames_per_item=3).collect()
    assert {r["frame_idx"] for r in got} <= set(range(6))
    assert all(r["n_frames"] == 6 and r["fps"] == 10 for r in got)
    # per-frame stats computed over REAL composited pixels
    first = [r for r in got if r["frame_idx"] == 0][0]
    assert first["mean_rgb"] == pytest.approx(
        [float(fr[0][..., c].mean()) for c in range(3)], abs=1e-6
    )
