"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata —
exactly how the reference treats its audio/video files (rows carry
name/size/duration; bytes live in object storage and are only touched
by external transcoders, /root/reference/load/AWSTranscoder.py:48-127,
/root/reference/load/TranscodeVideo.py:12-130).

The Spark-side plumbing here is real and tested: schemas, Arrow-batched
``mapInPandas`` operators with correct batch shapes, partition sizing.
The codec step itself is STUBBED — the sandbox image has no
image/audio libraries — behind ``_decode_image``/``_decode_audio``,
which raise NotImplementedError unless ``deterministic_fake=True``
(the test mode, which produces seeded fake features so the pipeline is
exercisable end to end).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image(content: bytes, deterministic_fake: bool) -> list[float]:
    """STUB: real impl would decode via PIL/opencv (not in this image).

    deterministic_fake=True produces a seeded 8-dim feature from the
    content hash — byte-stable, so tests can assert exact values."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv, not available in this environment"
        )
    h = hashlib.md5(content or b"").digest()
    return [b / 255.0 for b in h[:8]]


def extract_image_features(
    media: DataFrame, deterministic_fake: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary image content.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame;
    the decode runs per batch (vectorizable inside), output schema is
    fixed. At scale: repartition upstream so batches hold ~100-500
    images (media bytes dominate memory, not row count) — set
    ``spark.sql.files.maxPartitionBytes`` / ``maxRecordsPerBatch``
    accordingly."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image(c, deterministic_fake)
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    return media.mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def sample_audio_frames(
    media: DataFrame, frames_per_item: int = 4, deterministic_fake: bool = False
) -> DataFrame:
    """Frame sampling: 1 input row -> N output rows (flat-map shape via
    mapInPandas). The codec is stubbed; the fake slices the byte payload
    into N deterministic windows and hashes them."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_hash = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if not deterministic_fake:
                    raise NotImplementedError(
                        "audio decoding requires ffmpeg/librosa, not available here"
                    )
                data = bytes(content or b"")
                step = max(len(data) // frames_per_item, 1)
                for i in range(frames_per_item):
                    chunk = data[i * step : (i + 1) * step]
                    out_id.append(mid)
                    out_idx.append(i)
                    out_hash.append(hashlib.md5(chunk).hexdigest()[:12])
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_hash": out_hash}
            )

    return media.mapInPandas(op, schema=AUDIO_FRAME_SCHEMA)
