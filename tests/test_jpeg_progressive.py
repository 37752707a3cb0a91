"""Progressive (SOF2) JPEG: spectral selection + successive
approximation, encoder and decoder (operators/jpeg.py, T.81 annex G).

The load-bearing property: the progressive form carries EXACTLY the
same quantized coefficients as the baseline form, so decoding either
must give byte-identical pixels — every case pins that equality, which
exercises DC first/refine, AC first with EOB runs, and AC refinement
with buffered correction bits end to end."""

import numpy as np
import pytest

from dbp_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _rng():
    return np.random.default_rng(1234)


@pytest.mark.parametrize(
    "shape",
    [(16, 16), (8, 8), (17, 24, 3), (32, 32, 3), (9, 10, 3)],
    ids=["gray16", "gray8", "rgb-odd", "rgb32", "rgb-tiny-odd"],
)
def test_progressive_equals_baseline(shape):
    px = _rng().integers(0, 256, shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px))
    prog = decode_jpeg(encode_jpeg(px, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_subsampled_420():
    """4:2:0 progressive: the luma AC scans cover the component's own
    (non-interleaved) block grid, which is SMALLER than the MCU-padded
    grid at this width — the T.81 A.2.2 corner."""
    px = _rng().integers(0, 256, (17, 24, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, subsample=True))
    prog = decode_jpeg(encode_jpeg(px, subsample=True, progressive=True))
    assert np.array_equal(base, prog)


@pytest.mark.parametrize("quant", [4, 16, 40])
def test_progressive_quantized_eob_runs(quant):
    """Coarser quantization zeroes whole bands => long EOB runs and
    correction-bit buffering across blocks get exercised."""
    smooth = np.add.outer(np.arange(24) * 3, np.arange(40) * 2).astype(np.uint8)
    px = np.stack([smooth, smooth[::-1], smooth], axis=-1)
    base = decode_jpeg(encode_jpeg(px, quant=quant))
    prog = decode_jpeg(encode_jpeg(px, quant=quant, progressive=True))
    assert np.array_equal(base, prog)


def test_progressive_near_lossless_roundtrip():
    px = _rng().integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quant=1, progressive=True))
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 3


def test_progressive_truncated_raises_cleanly():
    """Truncation MID-SCAN fails loudly (ValueError, dead-letter
    routable). Truncation at a scan boundary is legal progressive data
    — later scans merely refine — so cut inside the first scan's
    entropy segment."""
    px = _rng().integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(px, progressive=True)
    sos = data.find(b"\xff\xda")
    (seglen,) = __import__("struct").unpack(">H", data[sos + 2 : sos + 4])
    with pytest.raises(ValueError):
        decode_jpeg(data[: sos + 2 + seglen + 2])


def test_progressive_restart_interval_refused():
    px = _rng().integers(0, 256, (16, 16), dtype=np.uint8)
    with pytest.raises(NotImplementedError, match="restart"):
        encode_jpeg(px, progressive=True, restart_interval=2)


def test_progressive_flows_through_multimodal():
    """A progressive payload decodes through the Arrow-batched image
    feature operator — the last mainstream-format stub is gone."""
    from dbp_etl_spark.operators.multimodal import _decode_image

    solid = np.zeros((16, 16, 3), np.uint8)
    solid[:, :, 0] = 200
    feats = _decode_image(
        bytes(encode_jpeg(solid, progressive=True)), "image/jpeg", False
    )
    base = _decode_image(bytes(encode_jpeg(solid)), "image/jpeg", False)
    assert feats == base
    assert abs(feats[0] - 200 / 255.0) < 0.05  # mean red channel tracks pixels
