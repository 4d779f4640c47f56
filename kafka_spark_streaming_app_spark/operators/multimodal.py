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

Codec coverage: every modality now has REAL pure-stdlib codecs for
multiple containers:

- image: PNG, the full JPEG family (baseline/progressive, gray/
  color/CMYK-YCCK, restarts) in ``operators/imagecodec.py``;
  GIF87a/89a with real LZW and animations
  (``operators/gifcodec.py``); baseline TIFF with PackBits
  (``operators/tiffcodec.py``);
- audio: RIFF/WAV 16-bit PCM (cross-checked against stdlib ``wave``)
  plus G.711 mu-law/A-law (bit-exact vs ``audioop``) and blocked IMA
  ADPCM in ``operators/avcodec.py``, and COMPRESSED audio via the
  FLAC fixed-predictor subset (``operators/flaccodec.py`` — Rice
  coding, stereo decorrelation, CRCs, MD5 self-check);
- video: YUV4MPEG2 (.y4m) raw-video encoder/decoder
  (``operators/avcodec.py``) and animated-GIF frame extraction;
- delivery containers: ZIP/TAR archives
  (``operators/archivecodec.py``, differential vs stdlib both
  directions) and WARC web archives with per-record gzip members
  (``operators/warccodec.py``).

``synthesize_image_media`` / ``synthesize_audio_media`` /
``synthesize_video_media`` plant genuine container bytes with
closed-form content, and the ``multimodal_image_decode`` /
``multimodal_audio_decode`` / ``multimodal_video_decode`` queries are
oracle-checked end-to-end through the real codecs.  Perceptual
codecs (MP3/AAC/H.264) still need ffmpeg, absent here:
``decode_payload`` raises ``NotImplementedError`` for those unless
``fake=True``, in which case a deterministic byte-derived fake (seeded
by the payload itself) stands in. Everything around that remaining
stub — schemas, UDF signatures, Arrow batch shapes, row expansion — is
real and tested.
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


def _spread_doc_ids(documents: DataFrame) -> DataFrame:
    """doc_id proxy rows about to feed a compute-dense Python render
    stage: spread them across the cluster FIRST. A small single-file
    table arrives as ONE input split, and a chained
    render->decode mapInPandas pipeline fuses into that one task, so
    without this exchange the whole per-row codec CPU runs serially.
    The exchange moves ~8 bytes/row (the id only — the payload is
    created AFTER it), hash partitioning on the high-cardinality
    doc_id is deterministic, and the explicit partition count is
    exempt from AQE coalescing, which sizes partitions by BYTES and
    cannot see per-row encode/decode cost. Sized to the cluster's
    defaultParallelism, never a constant — the same idiom
    synthesize_flac_media and synthesize_gif_animation_media
    established."""
    return documents.select("doc_id").repartition(
        documents.sparkSession.sparkContext.defaultParallelism, "doc_id"
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
    """Decode a media payload to a numpy array.

    ``fake=False`` (the real path) decodes PNG and baseline-JPEG
    images via the pure-stdlib codecs in ``operators/imagecodec.py``
    → (H, W) uint8. Compressed audio/video still need ffmpeg,
    absent here, and raise ``NotImplementedError``.

    ``fake=True`` returns a deterministic numpy array derived from the
    payload bytes (md5-seeded), preserving shape contracts:
    image → (H, W) uint8; audio → (N,) int16; video → (F, H, W) uint8.
    """
    import numpy as np

    if not fake:
        from .avcodec import _RIFF_MAGIC, _Y4M_MAGIC, decode_wav, decode_y4m
        from .imagecodec import (
            _JPEG_MAGIC,
            _PNG_MAGIC,
            decode_jpeg,
            decode_png,
        )

        buf = payload or b""
        if media_type == "image" and buf.startswith(_PNG_MAGIC):
            return decode_png(buf)
        if media_type == "image" and buf.startswith(_JPEG_MAGIC):
            return decode_jpeg(buf)["pixels"]
        if media_type == "audio" and buf.startswith(_RIFF_MAGIC):
            return decode_wav(buf)[0]
        if media_type == "video" and buf.startswith(_Y4M_MAGIC):
            return decode_y4m(buf)[0]
        raise NotImplementedError(
            "compressed media decoding requires codec libraries (ffmpeg) "
            "that are not installed (real paths: PNG + baseline-JPEG "
            "images, PCM WAV audio, Y4M video); pass fake=True for the "
            "deterministic test fake"
        )
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.default_rng(seed)
    if media_type == "image":
        return rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    if media_type == "audio":
        return rng.integers(-(2**15), 2**15, size=(256,), dtype=np.int16)
    return rng.integers(0, 256, size=(4, 8, 8), dtype=np.uint8)


IMAGE_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),  # png|jpeg
        T.StructField("payload", T.BinaryType(), True),
    ]
)

IMAGE_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)


def synthesize_image_media(documents: DataFrame) -> DataFrame:
    """REAL image fixture: even doc_ids become genuine 8-bit grayscale
    PNGs (encoded by ``imagecodec.encode_png`` — zlib IDAT, CRC'd
    chunks) with closed-form dimensions and pixel values

        W = doc_id % 24 + 8,  H = doc_id % 16 + 8,
        pixel(y, x) = (doc_id + 31*y + x) % 256

    so a SQL oracle can recompute every decoded byte; odd doc_ids get
    header-only JPEG containers (real SOI/APP0/SOF0 markers, dims
    W = doc_id % 640 + 16, H = doc_id % 480 + 16,
    channels = doc_id % 3 + 1).  Runs as an Arrow-batched mapInPandas
    stage — the shape a real "render/transcode" fixture stage takes."""
    from .imagecodec import encode_png, make_jpeg_header_bytes

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:
                    w, h = d % 24 + 8, d % 16 + 8
                    yy, xx = np.mgrid[0:h, 0:w]
                    pixels = ((d + 31 * yy + xx) % 256).astype(np.uint8)
                    rows.append(
                        {
                            "media_id": d,
                            "codec": "png",
                            "payload": encode_png(pixels),
                        }
                    )
                else:
                    rows.append(
                        {
                            "media_id": d,
                            "codec": "jpeg",
                            "payload": make_jpeg_header_bytes(
                                d % 640 + 16, d % 480 + 16, d % 3 + 1
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def image_header_metadata(media: DataFrame) -> DataFrame:
    """Parse real container headers (PNG IHDR / JPEG SOF marker scan)
    from the binary payload — the metadata-extraction stage that runs
    BEFORE any decode in a media pipeline (O(header) per row, no
    decompression)."""
    from .imagecodec import parse_image_header

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                hdr = parse_image_header(bytes(payload))
                hdr["media_id"] = media_id
                rows.append(hdr)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "format", "width", "height",
                    "bit_depth", "channels",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        parse, schema=IMAGE_HEADER_SCHEMA
    )


JPEG_QUANT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_tables", T.IntegerType(), True),
        T.StructField("quant_sum", T.LongType(), True),
        T.StructField("quant_min", T.IntegerType(), True),
        T.StructField("quant_max", T.IntegerType(), True),
    ]
)


def synthesize_jpeg_quant_media(documents: DataFrame) -> DataFrame:
    """JPEG fixture WITH real DQT quantization segments: every doc_id
    becomes a header-only JPEG carrying n = doc_id % 3 + 1 tables of
    64 deterministic 8-bit entries ``(doc_id + 17*t + j) % 255 + 1``
    (seeded by doc_id), dims W = doc_id % 640 + 16,
    H = doc_id % 480 + 16, channels = doc_id % 3 + 1."""
    from .imagecodec import make_jpeg_header_bytes

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {
                    "media_id": int(d),
                    "codec": "jpeg",
                    "payload": make_jpeg_header_bytes(
                        int(d) % 640 + 16,
                        int(d) % 480 + 16,
                        int(d) % 3 + 1,
                        quant_tables=int(d) % 3 + 1,
                        quant_seed=int(d),
                    ),
                }
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def jpeg_quant_metadata(media: DataFrame) -> DataFrame:
    """Parse DQT quantization tables + SOF dims from real JPEG bytes
    (operators/imagecodec.py:parse_jpeg_quant) — the compression-
    quality fingerprint stage of a media-curation pipeline; still
    O(header) per row, no entropy decode."""
    from .imagecodec import parse_jpeg_quant

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = parse_jpeg_quant(bytes(payload))
                meta["media_id"] = int(media_id)
                rows.append(meta)
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "channels",
                    "n_tables", "quant_sum", "quant_min", "quant_max",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        parse, schema=JPEG_QUANT_SCHEMA
    )


DECODED_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_min", T.IntegerType(), True),
        T.StructField("pixel_max", T.IntegerType(), True),
    ]
)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """REAL decode stage (``fake=False``): inflate + unfilter each PNG
    via the pure-stdlib decoder and emit exact integer pixel stats.
    Every value is a deterministic function of the decoded bytes, so a
    closed-form SQL oracle over the fixture's pixel formula catches any
    encoder OR decoder defect bit-exactly."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                img = decode_payload(bytes(payload), "image", fake=False)
                rows.append(
                    {
                        "media_id": media_id,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "n_pixels": int(img.size),
                        "pixel_sum": int(img.sum(dtype="int64")),
                        "pixel_min": int(img.min()),
                        "pixel_max": int(img.max()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels",
                    "pixel_sum", "pixel_min", "pixel_max",
                ],
            )

    pngs = media.filter(F.col("codec") == "png").select("media_id", "payload")
    return pngs.mapInPandas(stats, schema=DECODED_STATS_SCHEMA)


AUDIO_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("amp_sum", T.LongType(), True),
        T.StructField("amp_min", T.IntegerType(), True),
        T.StructField("amp_max", T.IntegerType(), True),
        T.StructField("energy", T.LongType(), True),
    ]
)


def synthesize_audio_media(documents: DataFrame) -> DataFrame:
    """REAL audio fixture: every doc becomes a genuine mono 16-bit PCM
    WAV (RIFF/fmt/data chunks via ``avcodec.encode_wav``) with
    closed-form content

        n = doc_id % 480 + 32 samples,
        rate = 8000 * (doc_id % 3 + 1),
        sample(i) = (doc_id * 7919 + i * 131) % 65536 - 32768

    so a SQL oracle can recompute every decoded sample."""
    from .avcodec import encode_wav

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 480 + 32
                rate = 8000 * (d % 3 + 1)
                i = np.arange(n, dtype=np.int64)
                samples = ((d * 7919 + i * 131) % 65536 - 32768).astype(
                    np.int16
                )
                rows.append(
                    {"media_id": d, "payload": encode_wav(samples, rate)}
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=AUDIO_MEDIA_SCHEMA
    )


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode stage: parse the RIFF container and the PCM
    samples per row inside mapInPandas; every output is an exact
    integer (sums/extrema/energy over int16 samples), so a closed-form
    SQL oracle over the fixture's sample formula catches any encoder
    OR decoder defect bit-exactly."""

    from .avcodec import decode_wav

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                # one chunk walk: decode_wav returns samples AND header
                samples, hdr = decode_wav(bytes(payload))
                s64 = samples.astype("int64")
                n = int(samples.size)  # interleaved samples
                # duration counts FRAMES (sample sets), not interleaved
                # samples — a stereo file is not twice as long
                frames = n // max(hdr["channels"], 1)
                rows.append(
                    {
                        "media_id": media_id,
                        "sample_rate": hdr["sample_rate"],
                        "channels": hdr["channels"],
                        "n_samples": n,
                        "duration_ms": frames * 1000 // hdr["sample_rate"],
                        "amp_sum": int(s64.sum()),
                        "amp_min": int(samples.min()) if n else 0,
                        "amp_max": int(samples.max()) if n else 0,
                        "energy": int((s64 * s64).sum()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "channels", "n_samples",
                    "duration_ms", "amp_sum", "amp_min", "amp_max", "energy",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=AUDIO_STATS_SCHEMA
    )


VIDEO_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("luma_sum", T.LongType(), True),
        T.StructField("luma_min", T.IntegerType(), True),
        T.StructField("luma_max", T.IntegerType(), True),
    ]
)


def synthesize_video_media(documents: DataFrame) -> DataFrame:
    """REAL video fixture: every doc becomes a genuine YUV4MPEG2 stream
    (``avcodec.encode_y4m``, Cmono luma planes) with closed-form frames

        W = doc_id % 16 + 8,  H = doc_id % 8 + 8,
        F = doc_id % 6 + 2,
        luma(f, y, x) = (doc_id + 7*f + 3*y + x) % 256."""
    from .avcodec import encode_y4m

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, nf = d % 16 + 8, d % 8 + 8, d % 6 + 2
                ff, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
                frames = ((d + 7 * ff + 3 * yy + xx) % 256).astype(np.uint8)
                rows.append({"media_id": d, "payload": encode_y4m(frames)})
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=AUDIO_MEDIA_SCHEMA
    )


def decode_video_frame_stats(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL video decode + frame sampling: parse the Y4M stream, keep
    every ``every_n``-th frame, emit exact integer luma stats per kept
    frame — the row-expanding decode shape with a real container."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_payload(bytes(payload), "video", fake=False)
                h, w = frames.shape[1], frames.shape[2]
                for idx in range(0, frames.shape[0], every_n):
                    fr = frames[idx].astype("int64")
                    rows.append(
                        {
                            "media_id": media_id,
                            "frame_idx": idx,
                            "width": w,
                            "height": h,
                            "luma_sum": int(fr.sum()),
                            "luma_min": int(fr.min()),
                            "luma_max": int(fr.max()),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "width", "height",
                    "luma_sum", "luma_min", "luma_max",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=VIDEO_FRAME_STATS_SCHEMA
    )


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


def extract_features_arrow(media: DataFrame, num_bins: int = 16) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_features`: the lower-level
    Arrow face — RecordBatch in, RecordBatch out, no pandas
    conversion. Same exact-integer arithmetic, so results are
    bit-identical to the pandas path (equivalence pinned by a test and
    by sharing the oracle). Use this face when batches are large and
    the pandas materialization cost matters."""

    def featurize(batches):
        import math

        import numpy as np
        import pyarrow as pa

        for batch in batches:
            ids = batch.column("media_id").to_pylist()
            types = batch.column("media_type").to_pylist()
            payloads = batch.column("payload").to_pylist()
            out = {
                "media_id": [], "media_type": [], "n_bytes": [],
                "byte_mean": [], "byte_std": [], "histogram": [],
            }
            for mid, mtype, payload in zip(ids, types, payloads):
                arr = np.frombuffer(payload or b"", dtype=np.uint8)
                hist = (
                    np.bincount(
                        arr.astype(np.int64) * num_bins // 256,
                        minlength=num_bins,
                    )
                    if arr.size
                    else np.zeros(num_bins, dtype=np.int64)
                )
                n = int(arr.size)
                s = int(arr.sum(dtype=np.int64))
                ss = int((arr.astype(np.int64) ** 2).sum())
                mean = s / n if n else 0.0
                var = max(0.0, ss / n - (s / n) * (s / n)) if n else 0.0
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["n_bytes"].append(n)
                out["byte_mean"].append(mean)
                out["byte_std"].append(math.sqrt(var))
                out["histogram"].append(hist.astype("int64").tolist())
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("media_id", pa.int64()),
                        ("media_type", pa.string()),
                        ("n_bytes", pa.int64()),
                        ("byte_mean", pa.float64()),
                        ("byte_std", pa.float64()),
                        ("histogram", pa.list_(pa.int64())),
                    ]
                ),
            )

    return media.select("media_id", "media_type", "payload").mapInArrow(
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



AHASH_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("b0", T.IntegerType(), True),
        T.StructField("b1", T.IntegerType(), True),
        T.StructField("b2", T.IntegerType(), True),
        T.StructField("b3", T.IntegerType(), True),
    ]
)


def synthesize_ahash_media(documents: DataFrame) -> DataFrame:
    """Paired near-duplicate PNG fixture for perceptual-hash dedup:
    doc_ids 2m and 2m+1 render the SAME closed-form image

        pair = doc_id // 2,
        W = pair % 24 + 8,  H = pair % 16 + 8,
        pixel(y, x) = (pair + 31*y + x) % 256

    except the odd member brightens every pixel with (y+x) % 17 == 0
    by +1 (clamped at 255) — the 'same photo, light retouch' case a
    perceptual hash must still match. Real encode_png bytes, so the
    downstream hash stage exercises the real decoder."""
    from .imagecodec import encode_png

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                pair = d // 2
                w, h = pair % 24 + 8, pair % 16 + 8
                yy, xx = np.mgrid[0:h, 0:w]
                pixels = ((pair + 31 * yy + xx) % 256).astype(np.int64)
                if d % 2 == 1:
                    pixels = np.minimum(
                        pixels + ((yy + xx) % 17 == 0), 255
                    )
                rows.append(
                    {
                        "media_id": d,
                        "codec": "png",
                        "payload": encode_png(pixels.astype(np.uint8)),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def ahash_bands(media: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) per image, REAL decode path:
    inflate + unfilter the PNG, partition into an 8x8 block grid
    (pixel (y, x) -> block (y*8//H, x*8//W)), and set bit i*8+j iff
    block (i, j)'s mean exceeds the global mean — compared by exact
    integer cross-multiplication block_sum * N > total_sum * n_block,
    so any engine reproduces the bits bit-for-bit. The hash is
    returned as four 16-bit bands (b0..b3, bit index 16k+r -> band k
    bit r): with Hamming radius 3, the pigeonhole principle
    guarantees near-dup pairs agree exactly on >= 1 band, so a
    band-equality equi-join is a COMPLETE candidate generator — the
    same banding contract as SimHash/LSH, here over decoded pixel
    content rather than tokens. Brightness shifts barely move bits
    (both sides of the comparison shift together), which is the
    perceptual-invariance aHash is chosen for."""
    from .imagecodec import decode_png

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_png(bytes(payload)).astype(np.int64)
                h, w = px.shape
                total = int(px.sum())
                n = h * w
                by = (np.arange(h) * 8) // h
                bx = (np.arange(w) * 8) // w
                blk = by[:, None] * 8 + bx[None, :]
                sums = np.bincount(blk.ravel(), weights=px.ravel(), minlength=64)
                cnts = np.bincount(blk.ravel(), minlength=64)
                bits = (sums * n) > (total * cnts)
                bands = [0, 0, 0, 0]
                for idx in np.nonzero(bits)[0]:
                    bands[idx // 16] |= 1 << (int(idx) % 16)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "b0": bands[0],
                        "b1": bands[1],
                        "b2": bands[2],
                        "b3": bands[3],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "b0", "b1", "b2", "b3"]
            )

    return media.select("media_id", "payload").mapInPandas(
        hash_batch, schema=AHASH_BANDS_SCHEMA
    )


def synthesize_afp_media(documents: DataFrame) -> DataFrame:
    """Paired near-duplicate WAV fixture for audio-fingerprint dedup:
    doc_ids 2m and 2m+1 carry the SAME closed-form waveform

        pair = doc_id // 2,
        n = pair % 480 + 64 samples,
        sample(i) = (pair * 7919 + i * 131) % 65536 - 32768

    except the odd member nudges every 13th sample by +3 (clamped at
    32767) — the 're-encoded with tiny noise' case a robust audio
    fingerprint must still match. Real encode_wav bytes (RIFF/fmt/
    data), so the hash stage exercises the real PCM decoder."""
    from .avcodec import encode_wav

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                pair = d // 2
                n = pair % 480 + 64
                i = np.arange(n, dtype=np.int64)
                v = (pair * 7919 + i * 131) % 65536 - 32768
                if d % 2 == 1:
                    v = np.minimum(v + 3 * (i % 13 == 0), 32767)
                rows.append(
                    {
                        "media_id": d,
                        "payload": encode_wav(v.astype(np.int16), 16000),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=AUDIO_MEDIA_SCHEMA
    )


def audio_fingerprint_bands(media: DataFrame) -> DataFrame:
    """64-bit energy fingerprint per clip through the REAL WAV decoder:
    samples are partitioned into 64 contiguous frames (sample i ->
    frame i*64//n), and bit f is set iff frame f's energy Σv² exceeds
    the clip's mean frame energy — by exact integer cross-
    multiplication e_f * n > E_total * n_f, so any engine reproduces
    the bits. Returned as four 16-bit bands for the same
    pigeonhole-complete Hamming-3 band join as :func:`ahash_bands`;
    small additive noise barely moves frame energies relative to the
    mean, which is the robustness an energy fingerprint buys (a
    production system adds spectral bands on top — FFT-free energy
    framing is the exactly-checkable core of the shape)."""
    from .avcodec import decode_wav

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                v = decode_wav(bytes(payload))[0].astype(np.int64)
                n = v.size
                f = (np.arange(n) * 64) // n
                ef = np.bincount(f, weights=v * v, minlength=64).astype(
                    np.int64
                )
                nf = np.bincount(f, minlength=64)
                total = int(ef.sum())
                bits = (ef * n) > (total * nf)
                bands = [0, 0, 0, 0]
                for idx in np.nonzero(bits)[0]:
                    bands[idx // 16] |= 1 << (int(idx) % 16)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "b0": bands[0],
                        "b1": bands[1],
                        "b2": bands[2],
                        "b3": bands[3],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "b0", "b1", "b2", "b3"]
            )

    return media.select("media_id", "payload").mapInPandas(
        fp, schema=AHASH_BANDS_SCHEMA
    )


def hamming_band_pairs(
    bands: DataFrame,
    id_col: str = "media_id",
    radius: int = 3,
    n_bands: int = 4,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Distinct (id_a, id_b, hamming) pairs within Hamming ``radius``
    over an ``n_bands`` x <=16-bit banded fingerprint (columns
    b0..bN): band-equality candidate generation with the exact
    popcount verify on candidates only — never all-pairs. With
    radius < n_bands the pigeonhole principle makes the candidate set
    COMPLETE (a pair within radius must agree exactly on >= 1 band).

    The joins run over DISTINCT FINGERPRINT VALUES, not corpus rows:
    media collapse to their fingerprint first, the per-band equi-join
    + Hamming verify pairs up value tuples (a join whose bucket sizes
    are bounded by HASH-SPACE diversity — for a 20-bit spectral hash,
    at most 2^15 values share a 5-bit band — regardless of corpus
    size), and member ids expand back through the value-pair table at
    the end, so that stage's cost is proportional to the TRUE pair
    output, not to corpus^2 (an 8x corpus probe on the row-level plan
    measured 21x — every extra image landed in the same few 5-bit
    band buckets). Identical-fingerprint pairs (hamming 0) come from
    the per-value member self-join — quadratic only in genuine
    duplicate-group sizes, which is the size of the answer itself.

    ``max_band_bucket`` is the hot-band cap the LSH family already
    carries (operators/dedup.py:lsh_candidate_pairs): band values with
    more than ``max_band_bucket`` MEMBERS (corpus rows, not distinct
    values) are boilerplate by definition and are excluded from THAT
    band's candidate generation; a capped-out pair can still surface
    through its other bands — pairs identical on ONLY hot bands are
    the recall price, exactly as in LSH (uncapped keeps the
    completeness guarantee — the driver-facing queries run uncapped
    on the quasi-random fixtures and the cap is regression-pinned by
    the planted-skew test)."""
    band_cols = [f"b{k}" for k in range(n_bands)]
    # the full band tuple as one comparable, joinable value key
    # (struct equality/ordering — a 4x16-bit integer fold would
    # overflow int64)
    vk = F.struct(*[F.col(bc).cast("int").alias(bc) for bc in band_cols])
    members = bands.select(
        F.col(id_col).alias("_mid"), *band_cols
    ).withColumn("_vk", vk).localCheckpoint(eager=False)
    # one row per distinct fingerprint value, with its member count
    # (the count drives the hot-band cap and the dup-group pairs)
    vals = (
        members.groupBy("_vk", *band_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=False)
    )

    if max_band_bucket is not None:
        # corpus member count per band value, per band (one tiny
        # aggregation per band — one row per distinct band value)
        band_small = [
            vals.groupBy(band_cols[k])
            .agg(F.sum("_n").alias("_bsz"))
            .filter(F.col("_bsz") <= max_band_bucket)
            .select(band_cols[k])
            for k in range(n_bands)
        ]
    cands = None
    for k in range(n_bands):
        side = vals
        if max_band_bucket is not None:
            side = vals.join(band_small[k], [band_cols[k]], "left_semi")
        a, b = side.alias("a"), side.alias("b")
        c = a.join(
            b,
            (F.col(f"a.{band_cols[k]}") == F.col(f"b.{band_cols[k]}"))
            & (F.col("a._vk") < F.col("b._vk")),
        ).select(
            F.col("a._vk").alias("vk_a"),
            F.col("b._vk").alias("vk_b"),
            *[F.col(f"a.{bc}").alias(f"a{bc}") for bc in band_cols],
            *[F.col(f"b.{bc}").alias(f"b{bc}") for bc in band_cols],
        )
        cands = c if cands is None else cands.unionAll(c)
    hamming = sum(
        F.bit_count(
            F.col(f"a{bc}").cast("long").bitwiseXOR(F.col(f"b{bc}").cast("long"))
        )
        for bc in band_cols
    )
    vpairs = (
        cands.distinct()
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= radius)
        .select("vk_a", "vk_b", "hamming")
    )
    ma = members.select(
        F.col("_vk").alias("vk_a"), F.col("_mid").alias("_ida")
    )
    mb = members.select(
        F.col("_vk").alias("vk_b"), F.col("_mid").alias("_idb")
    )
    cross = (
        vpairs.join(ma, "vk_a")
        .join(mb, "vk_b")
        .select(
            F.least("_ida", "_idb").alias("id_a"),
            F.greatest("_ida", "_idb").alias("id_b"),
            "hamming",
        )
    )
    # hamming-0 pairs: members sharing one fingerprint value. Under
    # the cap, a value's pairs surface iff >= 1 of its bands is small
    # (mirrors the row-level plan: identical fingerprints meet in any
    # uncapped band they share).
    dup_vals = vals.filter(F.col("_n") > 1).select("_vk", *band_cols)
    if max_band_bucket is not None:
        any_small = None
        for k in range(n_bands):
            flagged = dup_vals.join(
                band_small[k], [band_cols[k]], "left_semi"
            )
            any_small = (
                flagged
                if any_small is None
                else any_small.unionByName(flagged)
            )
        dup_vals = any_small.distinct()
    da = members.join(
        dup_vals.select("_vk"), "_vk"
    ).select("_vk", "_mid")
    same = (
        da.alias("x")
        .join(
            da.alias("y"),
            (F.col("x._vk") == F.col("y._vk"))
            & (F.col("x._mid") < F.col("y._mid")),
        )
        .select(
            F.col("x._mid").alias("id_a"),
            F.col("y._mid").alias("id_b"),
            F.lit(0).alias("hamming"),
        )
    )
    return cross.unionByName(same)


def synthesize_vfp_media(documents: DataFrame) -> DataFrame:
    """Paired near-duplicate Y4M fixture for video-fingerprint dedup:
    doc_ids 2m and 2m+1 carry the SAME closed-form 8x8 mono clip

        pair = doc_id // 2,
        n_frames = pair % 24 + 40,
        luma(f, y, x) = (pair * 31 + f * 7 + y * 3 + x) % 254

    except the odd member brightens every 11th frame by +1 — the
    're-encoded with a flash frame' case a temporal fingerprint must
    still match (modulus 254 keeps the +1 below the uint8 clamp, so
    the closed form needs no LEAST). Real encode_y4m bytes, so the
    hash stage exercises the real Cmono decoder."""
    from .avcodec import encode_y4m

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                pair = d // 2
                n = pair % 24 + 40
                f = np.arange(n)[:, None, None]
                y = np.arange(8)[None, :, None]
                x = np.arange(8)[None, None, :]
                luma = (pair * 31 + f * 7 + y * 3 + x) % 254
                if d % 2 == 1:
                    luma = luma + (f % 11 == 0).astype(np.int64)
                rows.append(
                    {
                        "media_id": d,
                        "payload": encode_y4m(luma.astype(np.uint8)),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=AUDIO_MEDIA_SCHEMA
    )


def video_fingerprint_bands(media: DataFrame) -> DataFrame:
    """64-bit temporal-luminance fingerprint per clip through the
    REAL Y4M decoder: frames are partitioned into 64 contiguous
    temporal buckets (frame f -> bucket f*64//n), and bit b is set
    iff bucket b's total luminance exceeds the clip's mean bucket
    luminance — exact integer cross-multiplication lum_b * n_buckets'
    ... same comparison discipline as :func:`ahash_bands` /
    :func:`audio_fingerprint_bands` (lum_b * n > total * nf), so any
    engine reproduces the bits. Returned as four 16-bit bands for the
    pigeonhole-complete Hamming-3 band join — the dedup family's
    fifth modality (text, embeddings, image, audio, video)."""
    from .avcodec import decode_y4m

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _ = decode_y4m(bytes(payload))
                n = frames.shape[0]
                fsum = frames.reshape(n, -1).sum(axis=1).astype(np.int64)
                b = (np.arange(n) * 64) // n
                # Accumulate bucket luminance in int64: bincount with
                # float weights sums in float64, which would round past
                # 2^53 on real-resolution clips and break the exact
                # integer threshold contract the oracle relies on.
                lb = np.zeros(64, dtype=np.int64)
                np.add.at(lb, b, fsum)
                nb = np.bincount(b, minlength=64)
                total = int(lb.sum())
                bits = (lb * n) > (total * nb)
                bands = [0, 0, 0, 0]
                for idx in np.nonzero(bits)[0]:
                    bands[idx // 16] |= 1 << (int(idx) % 16)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "b0": bands[0],
                        "b1": bands[1],
                        "b2": bands[2],
                        "b3": bands[3],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "b0", "b1", "b2", "b3"]
            )

    return media.select("media_id", "payload").mapInPandas(
        fp, schema=AHASH_BANDS_SCHEMA
    )


SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("cut_frame", T.LongType(), True),
        T.StructField("diff_sum", T.LongType(), True),
        T.StructField("n_pixels", T.LongType(), True),
    ]
)


def synthesize_scene_video_media(documents: DataFrame) -> DataFrame:
    """Scene-structured video fixture: genuine Y4M streams whose luma
    is piecewise-constant per SCENE with a small per-frame flicker —
    closed-form, so an oracle can recompute every pixel:

        W = doc_id % 16 + 8,  H = doc_id % 8 + 8,
        F = doc_id % 10 + 12,  seg = doc_id % 4 + 3,
        luma(f, y, x) = (doc_id*17 + (f // seg)*53 + (f % 2)*2
                         + 3*y + x) % 240

    Within a scene consecutive frames differ by the ±2 flicker (plus
    rare mod-wrap pixels); across a scene boundary the +53 base jump
    moves nearly every pixel."""
    from .avcodec import encode_y4m

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, nf = d % 16 + 8, d % 8 + 8, d % 10 + 12
                seg = d % 4 + 3
                ff, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
                luma = (
                    d * 17 + (ff // seg) * 53 + (ff % 2) * 2 + 3 * yy + xx
                ) % 240
                rows.append(
                    {"media_id": d, "payload": encode_y4m(luma.astype(np.uint8))}
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=AUDIO_MEDIA_SCHEMA
    )


def scene_cut_frames(media: DataFrame, mean_diff_x100: int = 2000) -> DataFrame:
    """Scene-change (shot-boundary) detection through the REAL Y4M
    decoder: a cut is declared at frame f+1 when the mean absolute
    luma difference against frame f exceeds ``mean_diff_x100``/100 —
    evaluated as the exact integer cross-multiplication
    ``100·Σ|Δluma| > thresh·n_pixels`` (no float thresholds, any
    engine reproduces the cut set bit-for-bit). This is the clip
    segmentation primitive a video training-data pipeline runs before
    per-scene sampling/dedup; per clip the work is one decode plus one
    vectorized frame-pair scan, Arrow-batched via ``mapInPandas`` with
    no shuffle at all — embarrassingly parallel at any corpus size."""
    from .avcodec import decode_y4m

    thresh = int(mean_diff_x100)

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _ = decode_y4m(bytes(payload))
                fr = frames.astype(np.int64)
                npix = fr.shape[1] * fr.shape[2]
                diffs = (
                    np.abs(fr[1:] - fr[:-1])
                    .reshape(fr.shape[0] - 1, -1)
                    .sum(axis=1)
                )
                for i in np.nonzero(100 * diffs > thresh * npix)[0]:
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "cut_frame": int(i) + 1,
                            "diff_sum": int(diffs[i]),
                            "n_pixels": npix,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "cut_frame", "diff_sum", "n_pixels"]
            )

    return media.mapInPandas(cuts, schema=SCENE_CUT_SCHEMA)


# Low-sequency Walsh-Hadamard coefficient set for the spectral hash:
# the 20 (u, v) frequency pairs with 1 <= u+v <= 5, enumerated in
# (u+v, u) order. Shared by the operator and the SQL oracle so both
# engines walk the identical coefficient order (bit k of the hash is
# coefficient WHT_COEFFS[k]).
WHT_COEFFS: list[tuple[int, int]] = [
    (u, s - u) for s in range(1, 6) for u in range(s + 1)
]

_WHT_SCALE = 1 << 20  # block-mean fixed point: m = (sum << 20) // count


def wht_spectral_bands(media: DataFrame) -> DataFrame:
    """20-bit spectral perceptual hash per image through the REAL PNG
    decoder — the pHash construction with the DCT replaced by the
    integer Walsh-Hadamard transform so the whole pipeline stays in
    EXACT int64 arithmetic (pHash's float DCT cannot be bit-pinned
    across engines; WHT signs can, and low-sequency WHT coefficients
    capture the same coarse spatial structure the DCT's low
    frequencies do).

    Stages: decode -> 8x8 block grid (the aHash grid) -> fixed-point
    block means m = (block_sum << 20) // count (exact integer floor) ->
    c(u,v) = Σ_{i,j} m[i,j]·(−1)^{popcount(i&u)+popcount(j&v)} for the
    20 low-sequency (u,v) in :data:`WHT_COEFFS` -> bit k = [c_k > 0].
    Sign bits of AC coefficients are brightness-invariant (a constant
    offset only moves the (0,0) DC term, which is excluded), the
    invariance pHash is chosen for. Bits pack into four 5-bit bands
    (b0..b3) for the same pigeonhole-complete radius-3
    :func:`hamming_band_pairs` join as aHash — same cap note for
    degenerate corpora."""
    from .imagecodec import decode_png

    def fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sign_tables = []
        for u, v in WHT_COEFFS:
            si = np.array(
                [(-1) ** bin(i & u).count("1") for i in range(8)],
                dtype=np.int64,
            )
            sj = np.array(
                [(-1) ** bin(j & v).count("1") for j in range(8)],
                dtype=np.int64,
            )
            sign_tables.append(np.outer(si, sj))
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_png(bytes(payload)).astype(np.int64)
                h, w = px.shape
                by = (np.arange(h) * 8) // h
                bx = (np.arange(w) * 8) // w
                blk = by[:, None] * 8 + bx[None, :]
                sums = np.zeros(64, dtype=np.int64)
                np.add.at(sums, blk.ravel(), px.ravel())
                cnts = np.bincount(blk.ravel(), minlength=64)
                m = (sums * _WHT_SCALE) // cnts  # exact int64 floor
                mm = m.reshape(8, 8)
                bands = [0, 0, 0, 0]
                for k, st in enumerate(sign_tables):
                    if int((mm * st).sum()) > 0:
                        bands[k // 5] |= 1 << (k % 5)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "b0": bands[0],
                        "b1": bands[1],
                        "b2": bands[2],
                        "b3": bands[3],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "b0", "b1", "b2", "b3"]
            )

    return media.select("media_id", "payload").mapInPandas(
        fp, schema=AHASH_BANDS_SCHEMA
    )


VAD_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("energy", T.LongType(), True),
    ]
)

VAD_FRAME_SAMPLES = 32


def synthesize_vad_media(documents: DataFrame) -> DataFrame:
    """Speech/silence WAV fixture for voice-activity detection: each
    clip alternates planted VOICED and quiet frames by the closed form

        n = doc_id % 480 + 96 samples @ 16 kHz, frame = 32 samples,
        frame f voiced iff (doc_id + f) % 3 == 0,
        voiced sample:  v(i) = (doc_id*37 + i*7) % 2048 - 1024
        quiet sample:   v(i) = (doc_id + i) % 8 - 4

    (~1/3 of frames carry ~30 dB more energy than the noise floor).
    Real encode_wav bytes, so the VAD stage exercises the real RIFF/
    PCM decoder."""
    from .avcodec import encode_wav

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 480 + 96
                i = np.arange(n, dtype=np.int64)
                voiced = (d + i // VAD_FRAME_SAMPLES) % 3 == 0
                loud = (d * 37 + i * 7) % 2048 - 1024
                quiet = (d + i) % 8 - 4
                v = np.where(voiced, loud, quiet)
                rows.append(
                    {
                        "media_id": d,
                        "payload": encode_wav(v.astype(np.int16), 16000),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=AUDIO_MEDIA_SCHEMA
    )


def vad_frames(media: DataFrame) -> DataFrame:
    """Fixed-size 32-sample frame energies per clip through the REAL
    WAV decoder: frame f covers samples [32f, 32f+32) (the last frame
    may be partial — kept, with its true n_samples, so the
    cross-multiplied threshold downstream stays exact), energy is the
    exact int64 Σv² accumulated via np.add.at (never float bincount
    weights). This is the decode half of VAD; the voiced/segment logic
    is a downstream DataFrame dataflow, keeping Python at the codec
    boundary only."""
    from .avcodec import decode_wav

    def fr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                v = decode_wav(bytes(payload))[0].astype(np.int64)
                n = v.size
                f = np.arange(n) // VAD_FRAME_SAMPLES
                nf = int(f[-1]) + 1 if n else 0
                e = np.zeros(nf, dtype=np.int64)
                np.add.at(e, f, v * v)
                cnt = np.bincount(f, minlength=nf)
                for k in range(nf):
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": k,
                            "n_samples": int(cnt[k]),
                            "energy": int(e[k]),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "n_samples", "energy"],
            )

    return media.select("media_id", "payload").mapInPandas(
        fr, schema=VAD_FRAME_SCHEMA
    )


RESIZE_PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("src_w", T.IntegerType(), True),
        T.StructField("src_h", T.IntegerType(), True),
        T.StructField("pixels_csv", T.StringType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_min", T.IntegerType(), True),
        T.StructField("pixel_max", T.IntegerType(), True),
    ]
)


def resize_png_pixels(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize through the REAL PNG decoder to a fixed
    (out_w × out_h) thumbnail — the normalize-before-featurize step
    every image training pipeline runs (CLIP-style preprocessing, with
    the interpolation kernel swapped for the exactly-checkable
    nearest-neighbor map src(y·H/out_h, x·W/out_w), integer floor
    indices). The ENTIRE resized pixel grid is serialized
    (comma-joined) so the oracle pins every output pixel, not a
    summary; exact int64 sum/min/max ride along for cheap downstream
    filters. Arrow-batched mapInPandas, zero shuffle."""
    from .imagecodec import decode_png

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_png(bytes(payload)).astype(np.int64)
                h, w = px.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                out = px[yi[:, None], xi[None, :]]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "src_w": w,
                        "src_h": h,
                        "pixels_csv": ",".join(
                            str(int(v)) for v in out.ravel()
                        ),
                        "pixel_sum": int(out.sum()),
                        "pixel_min": int(out.min()),
                        "pixel_max": int(out.max()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "src_w", "src_h", "pixels_csv",
                    "pixel_sum", "pixel_min", "pixel_max",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        rs, schema=RESIZE_PIXELS_SCHEMA
    )


MOTION_VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("frame_pair", T.IntegerType(), True),
        T.StructField("block_y", T.IntegerType(), True),
        T.StructField("block_x", T.IntegerType(), True),
        T.StructField("mv_dy", T.IntegerType(), True),
        T.StructField("mv_dx", T.IntegerType(), True),
        T.StructField("sad", T.LongType(), True),
    ]
)


def synthesize_motion_media(documents: DataFrame) -> DataFrame:
    """Rigid-motion Y4M fixture for motion estimation: every clip is a
    16×12 mono video of doc_id % 4 + 3 frames, frame f showing the
    SAME infinite lattice pattern

        b(y, x) = (doc_id + 13·y + 7·x) % 256

    sampled at offset (sy, sx) with sy(f) = (doc_id + f) % 2 and
    sx(f) = (doc_id·3 + 2·f) % 2 — so between consecutive frames the
    whole scene translates by a KNOWN delta in {−1, 0, 1}², and a
    correct block matcher must recover exactly that vector with
    SAD = 0. Real encode_y4m bytes, so the estimator exercises the
    real container."""
    from .avcodec import encode_y4m

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        W, H = 16, 12
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = d % 4 + 3
                frames = []
                for f in range(nf):
                    sy = (d + f) % 2
                    sx = (d * 3 + 2 * f) % 2
                    yy, xx = np.mgrid[0:H, 0:W]
                    frames.append(
                        (
                            (d + 13 * (yy + sy) + 7 * (xx + sx)) % 256
                        ).astype(np.uint8)
                    )
                rows.append(
                    {"media_id": d, "payload": encode_y4m(frames)}
                )
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=AUDIO_MEDIA_SCHEMA
    )


def block_motion_vectors(media: DataFrame) -> DataFrame:
    """Exhaustive-search block motion estimation through the REAL Y4M
    decoder — the core primitive of every video codec and of
    motion-based video dedup/scene analysis: for each consecutive
    frame pair, each 4×4 block of the LATER frame (anchored at the
    interior grid (y0, x0) ∈ {2, 6} × {2, 6, 10} so every ±1
    candidate stays in-bounds) searches the 9 displacements
    (dy, dx) ∈ {−1, 0, 1}² in the EARLIER frame and keeps the
    argmin-SAD vector, ties broken by (sad, dy, dx). All arithmetic
    is exact integer |Δluma| sums, so the chosen vectors and SADs are
    engine-exact. Arrow-batched mapInPandas, zero shuffle."""
    from .avcodec import decode_y4m

    def mv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # vectorized kernel: per frame pair, ALL blocks' SADs for all 9
        # candidates in 9 whole-frame array ops (|cur−shifted prev| →
        # 4x4 box sums via a (by,4,bx,4) reshape of the strided block
        # grid), then one argmin over the candidate axis with the
        # (sad, dy, dx) tie order encoded in the candidate ordering —
        # the per-block Python loop benched 4.3 s at sf0.1, this shape
        # removes all interpreter work from the hot path
        cands = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                planes, _hdr = decode_y4m(bytes(payload))
                frames = [f.astype(np.int64) for f in planes]
                h, w = frames[0].shape
                ys = list(range(2, h - 4 - 1, 4))
                xs = list(range(2, w - 4 - 1, 4))
                ny, nx = len(ys), len(xs)
                y_lo, y_hi = ys[0], ys[-1] + 4
                x_lo, x_hi = xs[0], xs[-1] + 4
                for f in range(len(frames) - 1):
                    prev, cur = frames[f], frames[f + 1]
                    blk = cur[y_lo:y_hi, x_lo:x_hi]
                    sads = np.empty((len(cands), ny, nx), dtype=np.int64)
                    for ci, (dy, dx) in enumerate(cands):
                        ref = prev[
                            y_lo + dy : y_hi + dy, x_lo + dx : x_hi + dx
                        ]
                        diff = np.abs(blk - ref)
                        sads[ci] = (
                            diff.reshape(ny, 4, nx, 4).sum(axis=(1, 3))
                        )
                    # argmin over candidates; np.argmin takes the FIRST
                    # minimum, and cands is already in (dy, dx) tie order
                    win = np.argmin(sads, axis=0)
                    for bi, y0 in enumerate(ys):
                        for bj, x0 in enumerate(xs):
                            ci = int(win[bi, bj])
                            rows.append(
                                {
                                    "media_id": int(media_id),
                                    "frame_pair": f,
                                    "block_y": y0,
                                    "block_x": x0,
                                    "mv_dy": cands[ci][0],
                                    "mv_dx": cands[ci][1],
                                    "sad": int(sads[ci, bi, bj]),
                                }
                            )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_pair", "block_y", "block_x",
                    "mv_dy", "mv_dx", "sad",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        mv, schema=MOTION_VECTOR_SCHEMA
    )


# --------------------------------------------------------------------------
# Baseline JPEG: entropy-coded fixtures + decode stats
# --------------------------------------------------------------------------

JPEG_COEF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_blocks", T.LongType(), True),
        T.StructField("n_nonzero", T.LongType(), True),
        T.StructField("coef_sum", T.LongType(), True),
        T.StructField("coef_min", T.IntegerType(), True),
        T.StructField("coef_max", T.IntegerType(), True),
        T.StructField("dc_sum", T.LongType(), True),
        T.StructField("posw_sum", T.LongType(), True),
    ]
)


def _jpeg_scan_fixture(d: int):
    """Closed-form planted scan for doc ``d``: (blocks-in-zigzag,
    width, height, qtable, restart_interval). Every value is a pure
    function of (d, block, position) so a SQL oracle re-derives the
    exact dequantized coefficient multiset. AC positions use stride 5
    mod 63 (injective for i <= 7) so positions never collide; AC
    values skip 0. Restart interval cycles 0/1/2 so the DRI + RSTn +
    DC-prediction-reset paths are exercised across the corpus."""
    wb, hb = d % 3 + 1, d % 2 + 1
    qtable = [(d * 7 + j) % 31 + 1 for j in range(64)]
    blocks = []
    for b in range(wb * hb):
        blk = [0] * 64
        blk[0] = (d + 11 * b) % 61 - 30
        nac = (d + b) % 6 + 2
        for i in range(1, nac + 1):
            p = (5 * i + 3 * b) % 63 + 1
            raw = (d + 13 * b + 29 * i) % 20 - 10
            blk[p] = raw + 1 if raw >= 0 else raw
        blocks.append(blk)
    return blocks, wb * 8, hb * 8, qtable, d % 3


def synthesize_jpeg_scan_media(documents: DataFrame) -> DataFrame:
    """REAL baseline-JPEG fixture WITH entropy-coded scan data: every
    doc becomes a genuine grayscale SOF0 JPEG (DQT/DHT/SOS + Huffman
    scan, per ``imagecodec.encode_jpeg_baseline``) whose quantized
    coefficients are the closed-form ``_jpeg_scan_fixture`` plants."""
    from .imagecodec import encode_jpeg_baseline

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                blocks, w, h, qtable, ri = _jpeg_scan_fixture(d)
                rows.append(
                    {
                        "media_id": d,
                        "codec": "jpeg",
                        "payload": encode_jpeg_baseline(
                            blocks, w, h, qtable, restart_interval=ri
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def jpeg_coef_stats(media: DataFrame) -> DataFrame:
    """REAL JPEG entropy decode (coefficient domain): Huffman + DC
    prediction + EOB/ZRL + restart sync + dequant + dezigzag per
    payload inside an Arrow-batched mapInPandas stage; emits exact
    integer stats over the NONZERO dequantized coefficients.
    ``posw_sum`` weights each coefficient by its natural (row*8+col)
    index, so a transposed or mis-permuted zigzag cannot hash-match."""
    from .imagecodec import decode_jpeg_baseline

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out = decode_jpeg_baseline(bytes(payload), want_pixels=False)
                nz = [
                    (idx, v)
                    for blk in out["blocks"]
                    for idx, v in enumerate(blk)
                    if v != 0
                ]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "width": out["width"],
                        "height": out["height"],
                        "n_blocks": len(out["blocks"]),
                        "n_nonzero": len(nz),
                        "coef_sum": sum(v for _, v in nz),
                        "coef_min": min(v for _, v in nz),
                        "coef_max": max(v for _, v in nz),
                        "dc_sum": sum(blk[0] for blk in out["blocks"]),
                        "posw_sum": sum(idx * v for idx, v in nz),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in JPEG_COEF_SCHEMA])

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=JPEG_COEF_SCHEMA
    )


def synthesize_jpeg_flat_media(documents: DataFrame) -> DataFrame:
    """DC-only baseline-JPEG fixture for PIXEL-exact decode: each
    block carries only a DC coefficient, so the IDCT output is flat
    per block with value clamp(dc * q0/8 + 128) — exactly
    SQL-recomputable because q0 is planted as a multiple of 8 (the
    /8 stays integral; no float rounding ties can occur). Dimensions
    are non-multiples of 8 (w = wb*8 - d%5, h = hb*8 - d%3) so the
    decoder's edge-block crop is on the oracle path too."""
    from .imagecodec import encode_jpeg_baseline

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                wb, hb = d % 3 + 1, d % 2 + 1
                w, h = wb * 8 - d % 5, hb * 8 - d % 3
                qtable = [8 * (d % 16 + 1)] + [
                    (d + j) % 255 + 1 for j in range(1, 64)
                ]
                blocks = []
                for b in range(wb * hb):
                    blk = [0] * 64
                    blk[0] = (d + 11 * b) % 61 - 30
                    blocks.append(blk)
                rows.append(
                    {
                        "media_id": d,
                        "codec": "jpeg",
                        "payload": encode_jpeg_baseline(
                            blocks, w, h, qtable, restart_interval=d % 4
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def jpeg_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL JPEG decode to PIXELS: the full pipeline (entropy decode,
    dequant, dezigzag, 2-D IDCT, +128 level shift, clamp, edge crop)
    per payload; emits exact integer pixel stats."""
    from .imagecodec import decode_jpeg_baseline

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out = decode_jpeg_baseline(bytes(payload), want_pixels=True)
                img = out["pixels"]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "width": out["width"],
                        "height": out["height"],
                        "n_pixels": int(img.size),
                        "pixel_sum": int(img.sum(dtype="int64")),
                        "pixel_min": int(img.min()),
                        "pixel_max": int(img.max()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels",
                    "pixel_sum", "pixel_min", "pixel_max",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=DECODED_STATS_SCHEMA
    )


JPEG_COLOR_COEF_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("component", T.IntegerType(), True),
        T.StructField("n_blocks", T.LongType(), True),
        T.StructField("n_nonzero", T.LongType(), True),
        T.StructField("coef_sum", T.LongType(), True),
        T.StructField("coef_min", T.IntegerType(), True),
        T.StructField("coef_max", T.IntegerType(), True),
        T.StructField("dc_sum", T.LongType(), True),
        T.StructField("posw_sum", T.LongType(), True),
    ]
)


def _jpeg_color_fixture(d: int):
    """Closed-form interleaved 4:2:0 plant for doc ``d``: returns
    (comp_blocks, samplings, width, height, qtables, restart). Block
    index b is SCAN order (MCU raster, Vi x Hi within MCU) — the
    oracle never needs spatial layout, only per-component counts.
    Dims are non-multiples of 16 so the MCU ceil is exercised."""
    mx, my = d % 2 + 1, (d // 2) % 2 + 1
    w, h = 16 * mx - d % 7, 16 * my - d % 5
    qy = [(d * 7 + j) % 31 + 1 for j in range(64)]
    qc = [(d * 5 + j) % 29 + 1 for j in range(64)]
    comp_blocks = []
    for ci, nb in ((0, 4 * mx * my), (1, mx * my), (2, mx * my)):
        blocks = []
        for b in range(nb):
            blk = [0] * 64
            blk[0] = (d + 11 * b + 7 * ci) % 61 - 30
            nac = (d + b + ci) % 6 + 2
            for i in range(1, nac + 1):
                p = (5 * i + 3 * b + 2 * ci) % 63 + 1
                raw = (d + 13 * b + 29 * i + 5 * ci) % 20 - 10
                blk[p] = raw + 1 if raw >= 0 else raw
            blocks.append(blk)
        comp_blocks.append(blocks)
    return (
        comp_blocks,
        [(2, 2), (1, 1), (1, 1)],
        w,
        h,
        [qy, qc, qc],
        d % 3,
    )


def synthesize_jpeg_color_media(documents: DataFrame) -> DataFrame:
    """REAL interleaved-color baseline-JPEG fixture: every doc becomes
    a genuine 3-component 4:2:0 YCbCr SOF0 JPEG (standard luminance +
    chrominance Huffman tables, interleaved MCU scan, per-component
    quant tables, DRI/RSTn) whose quantized coefficients are the
    closed-form ``_jpeg_color_fixture`` plants."""
    from .imagecodec import encode_jpeg_baseline_color

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                cb, samp, w, h, qts, ri = _jpeg_color_fixture(d)
                rows.append(
                    {
                        "media_id": d,
                        "codec": "jpeg",
                        "payload": encode_jpeg_baseline_color(
                            cb, samp, w, h, qts, restart_interval=ri
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def jpeg_color_coef_stats(media: DataFrame) -> DataFrame:
    """REAL interleaved-color JPEG entropy decode: the full 4:2:0 MCU
    walk (per-component Huffman/quant selection, per-component DC
    prediction with restart reset) per payload; one stats row per
    (media, component) over the nonzero dequantized coefficients. A
    decoder that mixes components' predictions, tables, or block
    ordering cannot hash-match."""
    from .imagecodec import decode_jpeg_baseline

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out = decode_jpeg_baseline(bytes(payload), want_pixels=False)
                for ci, comp in enumerate(out["components"]):
                    nz = [
                        (idx, v)
                        for blk in comp["blocks"]
                        for idx, v in enumerate(blk)
                        if v != 0
                    ]
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "width": out["width"],
                            "height": out["height"],
                            "component": ci,
                            "n_blocks": len(comp["blocks"]),
                            "n_nonzero": len(nz),
                            "coef_sum": sum(v for _, v in nz),
                            "coef_min": min(v for _, v in nz),
                            "coef_max": max(v for _, v in nz),
                            "dc_sum": sum(b[0] for b in comp["blocks"]),
                            "posw_sum": sum(i * v for i, v in nz),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_COLOR_COEF_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=JPEG_COLOR_COEF_SCHEMA
    )


def synthesize_jpeg_progressive_media(documents: DataFrame) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG fixture: the same closed-form
    coefficient plants as ``synthesize_jpeg_scan_media`` — including
    its per-doc restart interval (RSTn markers reset DC prediction
    AND the pending EOB run within every scan) — encoded through the
    multi-scan progressive coder: DC first + refinement, two spectral
    AC bands each with a successive-approximation first pass and a
    correction-bit refinement pass, EOBRUN coding throughout. The
    coefficient domain is lossless, so the SAME SQL oracle pins both
    codecs."""
    from .imagecodec import encode_jpeg_progressive

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                blocks, w, h, qtable, ri = _jpeg_scan_fixture(d)
                rows.append(
                    {
                        "media_id": d,
                        "codec": "jpeg",
                        "payload": encode_jpeg_progressive(
                            blocks, w, h, qtable, restart_interval=ri
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def jpeg_progressive_coef_stats(media: DataFrame) -> DataFrame:
    """REAL progressive-JPEG decode (via the SOF-marker dispatcher):
    accumulates every SOS scan's contribution — DC first/refinement,
    per-band AC first scans with EOBRUN, AC refinement correction
    bits — then emits the same exact integer coefficient stats as the
    baseline path."""
    from .imagecodec import decode_jpeg

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out = decode_jpeg(bytes(payload), want_pixels=False)
                nz = [
                    (idx, v)
                    for blk in out["blocks"]
                    for idx, v in enumerate(blk)
                    if v != 0
                ]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "width": out["width"],
                        "height": out["height"],
                        "n_blocks": len(out["blocks"]),
                        "n_nonzero": len(nz),
                        "coef_sum": sum(v for _, v in nz),
                        "coef_min": min(v for _, v in nz),
                        "coef_max": max(v for _, v in nz),
                        "dc_sum": sum(blk[0] for blk in out["blocks"]),
                        "posw_sum": sum(idx * v for idx, v in nz),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in JPEG_COEF_SCHEMA])

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=JPEG_COEF_SCHEMA
    )


def _jpeg_color_prog_fixture(d: int):
    """Closed-form COLOR PROGRESSIVE plant for doc ``d``: per
    component, REAL-grid raster blocks (ceil(comp_dims/8) — the grid
    AC scans walk; interleaved DC scans pad edge MCUs with dummy
    blocks on the wire). Crops up to 11/9 make ~1/4 of docs carry
    dummy luma rows/columns, so the skip geometry is exercised across
    the corpus. Block counts are pure ceil-division functions of
    (w, h), so the SQL oracle re-derives them."""
    mx, my = d % 2 + 1, (d // 2) % 2 + 1
    w, h = 16 * mx - d % 12, 16 * my - d % 10
    qy = [(d * 7 + j) % 31 + 1 for j in range(64)]
    qc = [(d * 5 + j) % 29 + 1 for j in range(64)]
    nb_y = ((w + 7) // 8) * ((h + 7) // 8)
    cw, ch = (w + 1) // 2, (h + 1) // 2
    nb_c = ((cw + 7) // 8) * ((ch + 7) // 8)
    comp_blocks = []
    for ci, nb in ((0, nb_y), (1, nb_c), (2, nb_c)):
        blocks = []
        for b in range(nb):
            blk = [0] * 64
            blk[0] = (d + 11 * b + 7 * ci) % 61 - 30
            nac = (d + b + ci) % 6 + 2
            for i in range(1, nac + 1):
                p = (5 * i + 3 * b + 2 * ci) % 63 + 1
                raw = (d + 13 * b + 29 * i + 5 * ci) % 20 - 10
                blk[p] = raw + 1 if raw >= 0 else raw
            blocks.append(blk)
        comp_blocks.append(blocks)
    return comp_blocks, [(2, 2), (1, 1), (1, 1)], w, h, [qy, qc, qc], d % 3


def synthesize_jpeg_color_progressive_media(documents: DataFrame) -> DataFrame:
    """COLOR PROGRESSIVE (SOF2 4:2:0) JPEG fixture: interleaved DC
    first/refinement scans + per-component spectral-band AC scans
    with successive approximation, EOBRUN and restart markers; edge
    crops plant dummy-block geometries."""
    from .imagecodec import encode_jpeg_progressive_color

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                cb, samp, w, h, qts, ri = _jpeg_color_prog_fixture(d)
                rows.append(
                    {
                        "media_id": d,
                        "codec": "jpeg",
                        "payload": encode_jpeg_progressive_color(
                            cb, samp, w, h, qts, restart_interval=ri
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def jpeg_color_progressive_coef_stats(media: DataFrame) -> DataFrame:
    """REAL color-progressive decode (via the SOF dispatcher): the
    interleaved-DC / per-component-AC scan accumulation with dummy
    blocks stripped; same per-(media, component) exact stats row as
    the baseline color path."""
    from .imagecodec import decode_jpeg

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out = decode_jpeg(bytes(payload), want_pixels=False)
                for ci, comp in enumerate(out["components"]):
                    nz = [
                        (idx, v)
                        for blk in comp["blocks"]
                        for idx, v in enumerate(blk)
                        if v != 0
                    ]
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "width": out["width"],
                            "height": out["height"],
                            "component": ci,
                            "n_blocks": len(comp["blocks"]),
                            "n_nonzero": len(nz),
                            "coef_sum": sum(v for _, v in nz),
                            "coef_min": min(v for _, v in nz),
                            "coef_max": max(v for _, v in nz),
                            "dc_sum": sum(b[0] for b in comp["blocks"]),
                            "posw_sum": sum(i * v for i, v in nz),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_COLOR_COEF_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=JPEG_COLOR_COEF_SCHEMA
    )


def _jpeg_cmyk_fixture(d: int):
    """Closed-form 4-component (Adobe YCCK) baseline plant for doc
    ``d``: 1x1 sampling on all four components (the common layout for
    CMYK scans — no subsampling), so every component carries the same
    wb x hb block grid and the interleaved MCU is 4 blocks. Distinct
    per-component quant tables and coefficient streams catch any
    component/table mixup in the 4-way interleaved walk."""
    wb, hb = d % 3 + 1, d % 2 + 1
    w, h = wb * 8 - d % 5, hb * 8 - d % 3
    qts = []
    for ci in range(4):
        if ci == 0:
            qts.append([(d * 7 + j) % 31 + 1 for j in range(64)])
        else:
            qts.append([(d * 5 + 7 * ci + j) % 29 + 1 for j in range(64)])
    comp_blocks = []
    for ci in range(4):
        blocks = []
        for b in range(wb * hb):
            blk = [0] * 64
            blk[0] = (d + 11 * b + 7 * ci) % 61 - 30
            nac = (d + b + ci) % 6 + 2
            for i in range(1, nac + 1):
                p = (5 * i + 3 * b + 2 * ci) % 63 + 1
                raw = (d + 13 * b + 29 * i + 5 * ci) % 20 - 10
                blk[p] = raw + 1 if raw >= 0 else raw
            blocks.append(blk)
        comp_blocks.append(blocks)
    return comp_blocks, w, h, qts, d % 3


def synthesize_jpeg_cmyk_media(documents: DataFrame) -> DataFrame:
    """REAL 4-component baseline-JPEG fixture: every doc becomes a
    genuine Adobe-style CMYK/YCCK SOF0 JPEG (APP14 transform 2, no
    JFIF APP0 — T.871 defines only 1/3-component JFIF frames, so real
    CMYK files signal through Adobe TN #5116), 4-way interleaved scan
    with per-component quant tables and DRI/RSTn restarts."""
    from .imagecodec import encode_jpeg_baseline_color

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                cb, w, h, qts, ri = _jpeg_cmyk_fixture(d)
                rows.append(
                    {
                        "media_id": d,
                        "codec": "jpeg",
                        "payload": encode_jpeg_baseline_color(
                            cb,
                            [(1, 1)] * 4,
                            w,
                            h,
                            qts,
                            restart_interval=ri,
                            adobe_transform=2,
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


JPEG_CHANNEL_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channel", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_min", T.IntegerType(), True),
        T.StructField("pixel_max", T.IntegerType(), True),
    ]
)


def synthesize_jpeg_ycck_flat_media(documents: DataFrame) -> DataFrame:
    """DC-only 4-component YCCK fixture for PIXEL-exact CMYK decode:
    Y and K carry DC-only blocks with q0 a multiple of 8 (flat integer
    planes, no rounding ties), the two chroma components are all-zero
    (value 128 after level shift), so the YCCK->CMYK inverse is
    closed-form: R = G = B = Y exactly at zero chroma, hence
    C = M = Y-channel = 255 - y_val and K passes through. Dims are
    non-multiples of 8 so the crop stays on the oracle path."""
    from .imagecodec import encode_jpeg_baseline_color

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                wb, hb = d % 3 + 1, d % 2 + 1
                w, h = wb * 8 - d % 5, hb * 8 - d % 3
                qy = [8 * (d % 16 + 1)] + [
                    (d + j) % 255 + 1 for j in range(1, 64)
                ]
                qk = [8 * ((d + 5) % 16 + 1)] + [
                    (d + 3 * j) % 255 + 1 for j in range(1, 64)
                ]
                qc = [16] * 64
                comp_blocks = []
                for ci in range(4):
                    blocks = []
                    for b in range(wb * hb):
                        blk = [0] * 64
                        if ci == 0:
                            blk[0] = (d + 11 * b) % 61 - 30
                        elif ci == 3:
                            blk[0] = (d + 13 * b + 7) % 61 - 30
                        blocks.append(blk)
                    comp_blocks.append(blocks)
                rows.append(
                    {
                        "media_id": d,
                        "codec": "jpeg",
                        "payload": encode_jpeg_baseline_color(
                            comp_blocks,
                            [(1, 1)] * 4,
                            w,
                            h,
                            [qy, qc, qc, qk],
                            restart_interval=d % 4,
                            adobe_transform=2,
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def jpeg_channel_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL JPEG decode to CMYK PIXELS: full pipeline (4-way
    interleaved entropy decode, dequant, IDCT, level shift, clamp,
    crop, APP14-driven YCCK->CMYK inverse transform); one exact
    integer stats row per (media, channel)."""
    from .imagecodec import decode_jpeg_baseline

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out = decode_jpeg_baseline(bytes(payload), want_pixels=True)
                img = out["pixels"]
                for ch in range(img.shape[-1]):
                    plane = img[..., ch]
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "width": out["width"],
                            "height": out["height"],
                            "channel": ch,
                            "n_pixels": int(plane.size),
                            "pixel_sum": int(plane.sum(dtype="int64")),
                            "pixel_min": int(plane.min()),
                            "pixel_max": int(plane.max()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_CHANNEL_PIXEL_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=JPEG_CHANNEL_PIXEL_SCHEMA
    )


# --------------------------------------------------------------------------
# GIF (LZW) media
# --------------------------------------------------------------------------


def _gif_fixture(d: int):
    """Closed-form indexed-color plant for doc ``d``: dims, palette
    and the pixel-index function mirrored exactly by the DuckDB
    oracle. Palette sizes 2..201 cross every LZW minimum code size
    (2..8 bits)."""
    w, h = d % 19 + 4, d % 13 + 3
    nc = d % 200 + 2
    palette = [
        ((d * 3 + 7 * j) % 256, (d * 5 + 11 * j) % 256, (d * 7 + 13 * j) % 256)
        for j in range(nc)
    ]
    idx = [
        (d + 3 * x + 5 * y + x * y) % nc
        for y in range(h)
        for x in range(w)
    ]
    return w, h, palette, idx


def synthesize_gif_media(documents: DataFrame) -> DataFrame:
    """REAL GIF fixture: every doc becomes a genuine GIF87a/89a file
    (real LZW with variable code widths and mid-stream clear codes,
    4-pass interlacing on even docs, a local color table with a decoy
    global table on d%5==0 docs, comment/NETSCAPE extension blocks on
    the 89a docs) encoded by the from-scratch coder in
    ``operators/gifcodec.py``."""
    from .gifcodec import encode_gif

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, palette, idx = _gif_fixture(d)
                local = d % 5 == 0
                rows.append(
                    {
                        "media_id": d,
                        "codec": "gif",
                        "payload": encode_gif(
                            idx,
                            w,
                            h,
                            palette,
                            interlace=d % 2 == 0,
                            local_palette=local,
                            global_palette=[(1, 2, 3), (4, 5, 6)],
                            clear_every=(d % 4) * 16,
                            comment=b"gif-plant" if d % 3 == 0 else None,
                            loop=d % 7 == 0,
                            version87=(
                                d % 11 == 0 and d % 3 != 0 and d % 7 != 0
                            ),
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def gif_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL GIF decode to RGB pixels: LZW decompression (variable
    widths, clear resets, KwKwK), de-interlacing, and color-table
    selection (local beats global) per payload; one exact integer
    stats row per (media, channel)."""
    import numpy as np

    from .gifcodec import decode_gif

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                g = decode_gif(bytes(payload))
                fr = g["frames"][0]
                pal = np.asarray(fr["palette"], dtype=np.int64)
                rgb = pal[np.asarray(fr["indices"], dtype=np.int64)]
                for ch in range(3):
                    plane = rgb[:, ch]
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "width": g["width"],
                            "height": g["height"],
                            "channel": ch,
                            "n_pixels": int(plane.size),
                            "pixel_sum": int(plane.sum()),
                            "pixel_min": int(plane.min()),
                            "pixel_max": int(plane.max()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_CHANNEL_PIXEL_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=JPEG_CHANNEL_PIXEL_SCHEMA
    )


GIF_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("frame", T.IntegerType(), True),
        T.StructField("channel", T.IntegerType(), True),
        T.StructField("delay_cs", T.IntegerType(), True),
        T.StructField("disposal", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_min", T.IntegerType(), True),
        T.StructField("pixel_max", T.IntegerType(), True),
    ]
)


def synthesize_gif_animation_media(documents: DataFrame) -> DataFrame:
    """Animated-GIF fixture: 2..5 full-canvas frames per doc, each
    with its own graphic-control block (delay, disposal method) and
    per-frame interlace choice, all through the real LZW coder."""
    from .gifcodec import encode_gif_animation

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, palette, _ = _gif_fixture(d)
                nc = len(palette)
                frames = []
                for f in range(d % 4 + 2):
                    frames.append(
                        {
                            "indices": [
                                (d + 17 * f + 3 * x + 5 * y) % nc
                                for y in range(h)
                                for x in range(w)
                            ],
                            "interlace": (d + f) % 2 == 0,
                            "delay_cs": 4 * f + 1,
                            "disposal": f % 4,
                        }
                    )
                rows.append(
                    {
                        "media_id": d,
                        "codec": "gif",
                        "payload": encode_gif_animation(
                            frames, w, h, palette, loop=True
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    # explicit partition count for the same AQE-coalescing reason as
    # synthesize_flac_media: per-row LZW work, not bytes, is the load.
    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def gif_frame_stats(media: DataFrame) -> DataFrame:
    """Animated-GIF decode: every frame independently LZW-decoded and
    de-interlaced, graphic-control metadata (delay, disposal) carried
    through; one stats row per (media, frame, channel)."""
    import numpy as np

    from .gifcodec import decode_gif

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                g = decode_gif(bytes(payload))
                for fi, fr in enumerate(g["frames"]):
                    pal = np.asarray(fr["palette"], dtype=np.int64)
                    rgb = pal[np.asarray(fr["indices"], dtype=np.int64)]
                    for ch in range(3):
                        plane = rgb[:, ch]
                        rows.append(
                            {
                                "media_id": int(media_id),
                                "frame": fi,
                                "channel": ch,
                                "delay_cs": fr["delay_cs"],
                                "disposal": fr["disposal"],
                                "n_pixels": int(plane.size),
                                "pixel_sum": int(plane.sum()),
                                "pixel_min": int(plane.min()),
                                "pixel_max": int(plane.max()),
                            }
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in GIF_FRAME_STATS_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=GIF_FRAME_STATS_SCHEMA
    )


# --------------------------------------------------------------------------
# G.711 companded audio media
# --------------------------------------------------------------------------

G711_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("audio_format", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("linear_sum", T.LongType(), True),
        T.StructField("linear_min", T.IntegerType(), True),
        T.StructField("linear_max", T.IntegerType(), True),
        T.StructField("abs_sum", T.LongType(), True),
        T.StructField("posw_sum", T.LongType(), True),
    ]
)


def synthesize_g711_media(documents: DataFrame) -> DataFrame:
    """G.711 WAV fixture: every doc becomes a real 8-bit mu-law
    (even doc_id, format code 7) or A-law (odd, code 6) WAV with a
    ``fact`` chunk; the companded byte stream is the closed-form
    plant (doc_id*7 + 31*i) % 256 — stride 31 is odd, so every doc
    with >= 256 samples covers all 256 code points of its law."""
    from .avcodec import encode_wav_g711

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 400 + 40
                payload = bytes((d * 7 + 31 * i) % 256 for i in range(n))
                law = "ulaw" if d % 2 == 0 else "alaw"
                rows.append(
                    {
                        "media_id": d,
                        "codec": "wav",
                        "payload": encode_wav_g711(payload, 8000, 1, law),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def g711_audio_stats(media: DataFrame) -> DataFrame:
    """G.711 decode: the RIFF walk picks the format code off the fmt
    chunk and expands every byte through the matching compander; one
    exact integer stats row per media (positional weighted sum pins
    sample order, abs-sum pins sign handling)."""
    import numpy as np

    from .avcodec import decode_wav

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, hdr = decode_wav(bytes(payload))
                v = samples.astype(np.int64)
                i = np.arange(v.size, dtype=np.int64)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "audio_format": hdr["audio_format"],
                        "sample_rate": hdr["sample_rate"],
                        "n_samples": int(v.size),
                        "linear_sum": int(v.sum()),
                        "linear_min": int(v.min()),
                        "linear_max": int(v.max()),
                        "abs_sum": int(np.abs(v).sum()),
                        "posw_sum": int((v * (i % 17)).sum()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in G711_STATS_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=G711_STATS_SCHEMA
    )


# --------------------------------------------------------------------------
# FLAC (compressed audio) media
# --------------------------------------------------------------------------

FLAC_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("channel", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_sum", T.LongType(), True),
        T.StructField("sample_min", T.IntegerType(), True),
        T.StructField("sample_max", T.IntegerType(), True),
        T.StructField("abs_sum", T.LongType(), True),
        T.StructField("posw_sum", T.LongType(), True),
    ]
)


def _flac_fixture(d: int):
    """Closed-form PCM plant mirrored exactly by the DuckDB oracle:
    1-2 channels, constant docs (d%13), wasted-bits docs (d%11 —
    samples share two trailing zero bits), quadratic-residue noise
    otherwise."""
    n = d % 777 + 64
    nch = 2 if d % 3 == 0 else 1
    scale = 4 if d % 11 == 0 else 1
    chans = []
    for c in range(nch):
        if d % 13 == 0:
            v = (d % 201 - 100) if c == 0 else (d % 157 - 78)
            chans.append([v] * n)
        elif c == 0:
            chans.append(
                [
                    ((d * 13 + 71 * i + (i * i * 7) % 97) % 2001 - 1000)
                    * scale
                    for i in range(n)
                ]
            )
        else:
            chans.append(
                [
                    ((d * 17 + 53 * i + (i * i * 11) % 89) % 2001 - 1000)
                    * scale
                    for i in range(n)
                ]
            )
    return chans


def synthesize_flac_media(documents: DataFrame) -> DataFrame:
    """REAL FLAC fixture: every doc becomes a genuine FLAC file —
    Rice-coded fixed-predictor subframes of every order plus VERBATIM
    and auto-detected CONSTANT, escape partitions on d%7 docs, wasted
    bits on d%11 docs, and the stereo docs rotate through all four
    channel-decorrelation modes; CRC-8/CRC-16 and the STREAMINFO MD5
    are live on every file."""
    from .flaccodec import encode_flac

    modes = ("independent", "left_side", "right_side", "mid_side")

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                chans = _flac_fixture(d)
                mode = modes[d % 4] if len(chans) == 2 else "independent"
                rows.append(
                    {
                        "media_id": d,
                        "codec": "flac",
                        "payload": encode_flac(
                            chans,
                            channel_mode=mode,
                            subframe_plan=lambda f, c, d=d: (
                                None
                                if (f + c + d) % 6 == 0
                                else (f + c + d) % 6 - 1
                            ),
                            escape_first=(d % 7 == 0),
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    # explicit partition count: AQE sizes coalescing by shuffle BYTES,
    # and a few MB of doc_ids would collapse onto one task — but each
    # row fans out into a full Rice encode + decode downstream, so the
    # Python codec stages need the row-count spread, not byte spread
    # (same reasoning as similarity._prep_vectors).
    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def flac_sample_stats(media: DataFrame) -> DataFrame:
    """REAL FLAC decode: full bitstream walk (frame sync, CRC-8
    header check, subframe dispatch, Rice/escape residual decode,
    fixed-predictor reconstruction, wasted-bit restore, channel
    de-decorrelation, CRC-16 and STREAMINFO-MD5 verification — any
    mismatch raises rather than mis-decoding); one exact integer
    stats row per (media, channel)."""
    import numpy as np

    from .flaccodec import decode_flac

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out = decode_flac(bytes(payload))
                for ch, samples in enumerate(out["samples"]):
                    v = np.asarray(samples, dtype=np.int64)
                    i = np.arange(v.size, dtype=np.int64)
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "channel": ch,
                            "sample_rate": out["sample_rate"],
                            "n_channels": out["channels"],
                            "n_samples": int(v.size),
                            "sample_sum": int(v.sum()),
                            "sample_min": int(v.min()),
                            "sample_max": int(v.max()),
                            "abs_sum": int(np.abs(v).sum()),
                            "posw_sum": int((v * (i % 31)).sum()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FLAC_STATS_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=FLAC_STATS_SCHEMA
    )


# --------------------------------------------------------------------------
# TIFF media
# --------------------------------------------------------------------------

TIFF_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("compression", T.IntegerType(), True),
        T.StructField("n_strips", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_min", T.IntegerType(), True),
        T.StructField("pixel_max", T.IntegerType(), True),
    ]
)


def _tiff_fixture(d: int):
    """Closed-form grayscale plant mirrored by the DuckDB oracle:
    PackBits docs (d%3==0) get run-friendly rows, the rest
    high-entropy pixels; strip heights 1..5 cross the multi-strip /
    single-strip and inline/out-of-line IFD storage paths."""
    w, h = d % 21 + 4, d % 15 + 3
    rps = d % 5 + 1
    if d % 3 == 0:
        px = [
            (d + y + (x // 6) * 11) % 256
            for y in range(h)
            for x in range(w)
        ]
    else:
        px = [
            (d * 5 + 3 * x + 7 * y + (x * y) % 13) % 256
            for y in range(h)
            for x in range(w)
        ]
    return w, h, rps, px


def synthesize_tiff_media(documents: DataFrame) -> DataFrame:
    """REAL TIFF fixture: genuine II/MM files (byte order by doc
    parity), multi-strip layouts with out-of-line StripOffsets /
    StripByteCounts arrays, PackBits RLE on every third doc."""
    from .tiffcodec import encode_tiff

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, rps, px = _tiff_fixture(d)
                rows.append(
                    {
                        "media_id": d,
                        "codec": "tiff",
                        "payload": encode_tiff(
                            px,
                            w,
                            h,
                            big_endian=d % 2 == 0,
                            packbits=d % 3 == 0,
                            rows_per_strip=rps,
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def tiff_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL TIFF decode: endian-aware IFD walk, inline-vs-offset tag
    values, strip reassembly, PackBits expansion; one exact integer
    stats row per media."""
    from .tiffcodec import decode_tiff

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out = decode_tiff(bytes(payload))
                px = out["pixels"]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "width": out["width"],
                        "height": out["height"],
                        "compression": out["compression"],
                        "n_strips": out["n_strips"],
                        "n_pixels": len(px),
                        "pixel_sum": sum(px),
                        "pixel_min": min(px),
                        "pixel_max": max(px),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TIFF_STATS_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=TIFF_STATS_SCHEMA
    )


# --------------------------------------------------------------------------
# IMA ADPCM media
# --------------------------------------------------------------------------

ADPCM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sample_sum", T.LongType(), True),
        T.StructField("sample_min", T.IntegerType(), True),
        T.StructField("sample_max", T.IntegerType(), True),
        T.StructField("posw_sum", T.LongType(), True),
    ]
)


def synthesize_adpcm_media(documents: DataFrame) -> DataFrame:
    """IMA-ADPCM WAV fixture: a closed-form nibble stream per doc
    ((d*3 + 5j + j²%11) % 16) from a closed-form initial state, run
    through the real state machine so every 36-byte block carries a
    correct header; the DuckDB oracle replays the same machine with a
    recursive CTE."""
    from .avcodec import encode_wav_ima

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = d % 600 + 50
                nibs = (
                    (d * 3 + 5 * j + (j * j) % 11) % 16 for j in range(n)
                )
                rows.append(
                    {
                        "media_id": d,
                        "codec": "wav",
                        "payload": encode_wav_ima(
                            nibs, d % 2001 - 1000, d % 89, n,
                            block_align=36,
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def adpcm_sample_stats(media: DataFrame) -> DataFrame:
    """IMA-ADPCM decode: per-block header restart, low-nibble-first
    expansion through the (predictor, step-index) machine, fact-chunk
    sample cap; one exact integer stats row per media."""
    from .avcodec import decode_wav_ima

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, hdr = decode_wav_ima(bytes(payload))
                rows.append(
                    {
                        "media_id": int(media_id),
                        "sample_rate": hdr["sample_rate"],
                        "n_samples": len(samples),
                        "sample_sum": sum(samples),
                        "sample_min": min(samples),
                        "sample_max": max(samples),
                        "posw_sum": sum(
                            v * (i % 29) for i, v in enumerate(samples)
                        ),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ADPCM_STATS_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=ADPCM_STATS_SCHEMA
    )


# --------------------------------------------------------------------------
# Archive (ZIP/TAR) media
# --------------------------------------------------------------------------

ARCHIVE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("member", T.IntegerType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_sum", T.LongType(), True),
    ]
)


def _archive_member(d: int, m: int) -> bytes:
    """Closed-form member payload mirrored by the DuckDB oracle; odd
    members are constant runs so real deflate entries appear on the
    ZIP wire alongside stored ones."""
    n = (d + m * 37) % 300 + 10
    if m % 2:
        return bytes([(d + m) % 256]) * n
    return bytes((d * 7 + m * 13 + i) % 256 for i in range(n))


def synthesize_archive_media(documents: DataFrame) -> DataFrame:
    """Corpus-delivery fixture: even docs become real ZIP archives
    (central directory, CRC-32, stored + deflate members), odd docs
    ustar TAR archives (octal fields, header checksums), 1-4 members
    each, written by the from-scratch coders in
    operators/archivecodec.py."""
    from .archivecodec import write_tar, write_zip

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                members = [
                    (f"part-{m}.bin", _archive_member(d, m))
                    for m in range(d % 4 + 1)
                ]
                payload = (
                    write_zip(members) if d % 2 == 0 else write_tar(members)
                )
                rows.append(
                    {"media_id": d, "codec": "zip" if d % 2 == 0 else "tar",
                     "payload": payload}
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def archive_member_stats(media: DataFrame) -> DataFrame:
    """Archive extraction: ZIP via the central directory with CRC-32
    verification, TAR via checksum-validated ustar blocks; one exact
    integer stats row per (media, member)."""
    from .archivecodec import read_tar, read_zip

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["codec"], pdf["payload"]
            ):
                members = (
                    read_zip(bytes(payload))
                    if kind == "zip"
                    else read_tar(bytes(payload))
                )
                for m, (name, raw) in enumerate(members):
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "kind": kind,
                            "member": m,
                            "name": name,
                            "n_bytes": len(raw),
                            "byte_sum": sum(raw),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ARCHIVE_STATS_SCHEMA]
            )

    return media.select("media_id", "codec", "payload").mapInPandas(
        stats, schema=ARCHIVE_STATS_SCHEMA
    )


# --------------------------------------------------------------------------
# WARC (web-archive) media
# --------------------------------------------------------------------------

WARC_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("record", T.IntegerType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("gzipped", T.BooleanType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("char_sum", T.LongType(), True),
    ]
)


def _warc_body(d: int, m: int) -> bytes:
    n = (d + 41 * m) % 500 + 20
    return bytes(97 + (d * 3 + m * 7 + i) % 26 for i in range(n))


def synthesize_warc_media(documents: DataFrame) -> DataFrame:
    """Web-crawl fixture: every doc becomes a real WARC file — a
    warcinfo record, then request/response pairs with full HTTP/1.1
    messages — in the Common Crawl one-gzip-member-per-record layout
    on even docs and plain concatenation on odd ones."""
    from .warccodec import http_response, write_warc

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                recs = [
                    (
                        "warcinfo",
                        {"WARC-Record-ID": f"<urn:uuid:{d}-info>"},
                        b"software: spark-graft-fixture\r\n",
                    )
                ]
                for m in range(d % 3 + 1):
                    uri = f"http://example.com/{d}/{m}"
                    recs.append(
                        (
                            "request",
                            {"WARC-Target-URI": uri,
                             "WARC-Record-ID": f"<urn:uuid:{d}-{m}-q>"},
                            b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n",
                        )
                    )
                    recs.append(
                        (
                            "response",
                            {"WARC-Target-URI": uri,
                             "WARC-Record-ID": f"<urn:uuid:{d}-{m}-r>"},
                            http_response(
                                200,
                                "OK",
                                {"Content-Type": "text/plain"},
                                _warc_body(d, m),
                            ),
                        )
                    )
                rows.append(
                    {
                        "media_id": d,
                        "codec": "warc",
                        "payload": write_warc(
                            recs, gzip_per_record=d % 2 == 0
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    return _spread_doc_ids(documents).mapInPandas(
        render, schema=IMAGE_MEDIA_SCHEMA
    )


def warc_response_stats(media: DataFrame) -> DataFrame:
    """WARC extraction: gzip-member splitting (even docs), record
    framing, response filtering, nested HTTP parse; one exact row per
    (media, response record) — the web-corpus ingestion front door."""
    from .warccodec import parse_http_response, read_warc

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                gz = raw[:2] == b"\x1f\x8b"
                responses = [
                    r for r in read_warc(raw) if r["type"] == "response"
                ]
                for m, rec in enumerate(responses):
                    h = parse_http_response(rec["block"])
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "record": m,
                            "target_uri": rec["headers"][
                                "WARC-Target-URI"
                            ],
                            "status": h["status"],
                            "gzipped": gz,
                            "n_bytes": len(h["body"]),
                            "char_sum": sum(h["body"]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_STATS_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=WARC_STATS_SCHEMA
    )


JPEG_THUMB_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("thumb_w", T.IntegerType(), True),
        T.StructField("thumb_h", T.IntegerType(), True),
        T.StructField("n_pixels", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_min", T.IntegerType(), True),
        T.StructField("pixel_max", T.IntegerType(), True),
        T.StructField("posw_sum", T.LongType(), True),
    ]
)


def jpeg_dc_thumbnail_stats(media: DataFrame) -> DataFrame:
    """1/8-scale thumbnails from PROGRESSIVE JPEGs by decoding ONLY
    the DC scans (every DC scan precedes the first AC scan, so the
    decoder stops before any AC entropy data is parsed — the
    production thumbnail fast path that reads a fraction of each
    file). Thumb pixel per block = clamp(floor(dequant_dc / 8) + 128)
    — exactly the DC-only IDCT; one exact stats row per media with a
    block-order positional pin."""
    from .imagecodec import decode_jpeg_progressive

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                out = decode_jpeg_progressive(
                    bytes(payload), want_pixels=False, dc_only=True
                )
                comp = out["components"][0]
                px = [
                    min(255, max(0, (blk[0] // 8) + 128))
                    for blk in comp["blocks"]
                ]
                rows.append(
                    {
                        "media_id": int(media_id),
                        "thumb_w": (out["width"] + 7) // 8,
                        "thumb_h": (out["height"] + 7) // 8,
                        "n_pixels": len(px),
                        "pixel_sum": sum(px),
                        "pixel_min": min(px),
                        "pixel_max": max(px),
                        "posw_sum": sum(
                            v * (b % 13) for b, v in enumerate(px)
                        ),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in JPEG_THUMB_SCHEMA]
            )

    return media.select("media_id", "payload").mapInPandas(
        stats, schema=JPEG_THUMB_SCHEMA
    )


# --------------------------------------------------------------------------
# Compressed-text media (gzip / bz2 / xz)
# --------------------------------------------------------------------------

COMPRESSED_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
        T.StructField("text_md5", T.StringType(), True),
    ]
)


def synthesize_compressed_text_media(documents: DataFrame) -> DataFrame:
    """Corpus-mirror fixture: each doc's real text compressed with
    the stdlib codecs corpora actually ship in — gzip (Common Crawl),
    bz2 (Wikipedia dumps), xz/LZMA (many mirrors) — cycling by
    doc_id."""
    import bz2
    import gzip
    import lzma

    coders = (
        ("gzip", lambda b: gzip.compress(b, 9, mtime=0)),
        ("bz2", bz2.compress),
        ("xz", lzma.compress),
    )

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                name, fn = coders[d % 3]
                rows.append(
                    {
                        "media_id": d,
                        "codec": name,
                        "payload": fn(str(text).encode("utf-8")),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "codec", "payload"])

    # Unlike the doc_id-proxy renders, this stage consumes the TEXT
    # column, so an unconditional repartition would re-shuffle the
    # whole corpus at scale (where a many-split scan already spreads
    # it). Spread only when the scan arrives narrower than the
    # cluster — the local single-split case where the compress+decode
    # chain would otherwise run one-task.
    src = documents.select("doc_id", "text")
    par = documents.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par, "doc_id")
    return src.mapInPandas(render, schema=IMAGE_MEDIA_SCHEMA)


def compressed_text_stats(media: DataFrame) -> DataFrame:
    """Decompress by MAGIC-BYTE sniffing (never trusting the label:
    1f8b gzip, BZh bz2, FD 37 7A 58 5A xz — a mislabeled payload
    raises), then exact text stats; decompression is lossless, so the
    oracle derives the same stats from the source text column."""
    import bz2
    import gzip
    import lzma

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, label, payload in zip(
                pdf["media_id"], pdf["codec"], pdf["payload"]
            ):
                raw = bytes(payload)
                if raw[:2] == b"\x1f\x8b":
                    sniffed, text = "gzip", gzip.decompress(raw)
                elif raw[:3] == b"BZh":
                    sniffed, text = "bz2", bz2.decompress(raw)
                elif raw[:6] == b"\xfd7zXZ\x00":
                    sniffed, text = "xz", lzma.decompress(raw)
                else:
                    raise ValueError(
                        f"media {media_id}: unknown compression magic "
                        f"{raw[:6]!r}"
                    )
                if sniffed != label:
                    raise ValueError(
                        f"media {media_id}: payload magic {sniffed} != "
                        f"label {label}"
                    )
                import hashlib as _hl

                s = text.decode("utf-8")
                rows.append(
                    {
                        "media_id": int(media_id),
                        "codec": sniffed,
                        "n_chars": len(s),
                        # md5 of the decompressed bytes == oracle-side
                        # md5(text): every decompressed byte is on the
                        # hash path (compressed sizes are library-
                        # version-dependent and stay out of the oracle)
                        "text_md5": _hl.md5(text).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in COMPRESSED_TEXT_SCHEMA]
            )

    return media.select("media_id", "codec", "payload").mapInPandas(
        stats, schema=COMPRESSED_TEXT_SCHEMA
    )
