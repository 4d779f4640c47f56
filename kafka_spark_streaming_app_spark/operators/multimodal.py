"""Multimodal columns: images/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The pattern for a 100 TB multimodal corpus:

- the payload is an opaque ``binary`` column; Spark never interprets
  it — only Pandas-UDF stages do, in Arrow batches (one Python round
  trip per ~10k rows, not per row);
- metadata travels in a typed struct column so planning-relevant
  predicates (media_type, width, duration) stay JVM-side and prune
  before any Python/decode cost;
- decode / resize / frame-sample are per-partition ``mapInPandas``
  stages: streaming batch iterators, so a partition never has to fit
  decoded media in memory at once;
- partitioning: payload rows are large — repartition by byte budget
  (``spark.sql.files.maxPartitionBytes``), never by row count.

Codec libraries (PIL/ffmpeg/torchaudio) are NOT in this environment,
so the actual decoders are STUBBED: ``decode_payload`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic byte-derived fake (seeded by the payload itself) stands
in. Everything around the stub — schemas, UDF signatures, Arrow batch
shapes, row expansion — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_mean", T.DoubleType(), True),
        T.StructField("byte_std", T.DoubleType(), True),
        T.StructField("histogram", T.ArrayType(T.LongType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table from ``documents``: payload = utf-8
    text bytes (a stand-in blob), media_type cycles image/audio/video,
    metadata derived from doc stats. Gives multimodal plumbing a real,
    reproducible fixture without codec libs."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("raw").alias("format"),
            F.when(F.col("doc_id") % 3 == 0, (F.col("n_chars") % 640 + 16).cast("int"))
            .otherwise(F.lit(None).cast("int"))
            .alias("width"),
            F.when(F.col("doc_id") % 3 == 0, (F.col("n_chars") % 480 + 16).cast("int"))
            .otherwise(F.lit(None).cast("int"))
            .alias("height"),
            F.when(F.col("doc_id") % 3 == 1, F.lit(16000)).otherwise(
                F.lit(None).cast("int")
            ).alias("sample_rate"),
            F.when(F.col("doc_id") % 3 == 2, (F.col("n_chars") % 32 + 2).cast("int"))
            .otherwise(F.lit(None).cast("int"))
            .alias("n_frames"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, media_type: str, fake: bool = False):
    """STUB: real decoding needs PIL/ffmpeg/torchaudio, absent here.

    ``fake=True`` returns a deterministic numpy array derived from the
    payload bytes (md5-seeded), preserving shape contracts:
    image → (H, W) uint8; audio → (N,) int16; video → (F, H, W) uint8.
    """
    import numpy as np

    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries (PIL/ffmpeg) that are "
            "not installed; pass fake=True for the deterministic test fake"
        )
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    if media_type == "image":
        return rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    if media_type == "audio":
        return rng.integers(-(2**15), 2**15, size=(256,), dtype=np.int16)
    return rng.integers(0, 256, size=(4, 8, 8), dtype=np.uint8)


def extract_features(media: DataFrame, num_bins: int = 16) -> DataFrame:
    """Byte-level feature extraction via ``mapInPandas``: batch
    iterator in, batch iterator out — the canonical shape for any
    decode-and-featurize stage (swap the body for a real decoder +
    model when codecs are available)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            out = []
            for media_id, media_type, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                arr = np.frombuffer(payload or b"", dtype=np.uint8)
                # arr * num_bins // 256 lands in [0, num_bins) for ANY
                # num_bins (floor-dividing by 256//num_bins overflows
                # into an extra bin when num_bins doesn't divide 256)
                hist = (
                    np.bincount(
                        arr.astype(np.int64) * num_bins // 256,
                        minlength=num_bins,
                    )
                    if arr.size
                    else np.zeros(num_bins, dtype=np.int64)
                )
                # mean/std from EXACT integer power sums (values ≤ 255,
                # sums stay far below 2^53): every downstream double op
                # (divide, multiply, subtract, sqrt) is then a single
                # IEEE rounding an oracle engine reproduces bit-for-bit
                n = int(arr.size)
                s = int(arr.sum(dtype=np.int64))
                ss = int((arr.astype(np.int64) ** 2).sum())
                mean = s / n if n else 0.0
                var = max(0.0, ss / n - (s / n) * (s / n)) if n else 0.0
                out.append(
                    {
                        "media_id": media_id,
                        "media_type": media_type,
                        "n_bytes": n,
                        "byte_mean": mean,
                        "byte_std": math.sqrt(var),
                        "histogram": hist.astype("int64").tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "media_type", "payload").mapInPandas(
        featurize, schema=FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling for video rows — demonstrates the row-EXPANDING
    mapInPandas shape (one input row → n_frames/every_n output rows).
    Frame payloads are deterministic slices of the (fake-decoded)
    payload; a real implementation swaps the slicing for ffmpeg."""

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                if n_frames is None or pd.isna(n_frames):
                    continue
                buf = payload or b""
                step = max(len(buf) // max(int(n_frames), 1), 1)
                for idx in range(0, int(n_frames), every_n):
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "frame_payload": buf[idx * step : (idx + 1) * step],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_payload"]
            )

    vids = media.filter(F.col("media_type") == "video").select(
        "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )
    return vids.mapInPandas(expand, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, width: int = 8, height: int = 8
) -> DataFrame:
    """Resize stage for image rows — the mapInPandas shape a real
    PIL/opencv resize plugs into. Without codecs, the body fake-decodes
    (deterministic, payload-seeded) and nearest-neighbor-resamples the
    16x16 fake grid to (height, width); the output contract (one row
    per image, row-major uint8 bytes + final dims) is what matters.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_payload(payload, "image", fake=True)
                ys = (np.arange(height) * img.shape[0] // height)
                xs = (np.arange(width) * img.shape[1] // width)
                small = img[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_id": media_id,
                        "width": width,
                        "height": height,
                        "pixels": small.tobytes(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "pixels"]
            )

    imgs = media.filter(F.col("media_type") == "image").select(
        "media_id", "payload"
    )
    return imgs.mapInPandas(resize, schema=RESIZED_SCHEMA)

