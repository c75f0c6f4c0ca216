"""Multimodal column operators: image/audio/video as opaque binary columns.

Design for 100 TB media pipelines:

- media travels as ``binary`` columns with a typed metadata struct
  (MEDIA_SCHEMA) — Spark shuffles/stores bytes opaquely; Parquet keeps
  them as BYTE_ARRAY with page compression;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: bytes never round-trip through Python row
  objects, and batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory
  (set it low for video);
- partitioning: media rows are large and skewed — repartition by
  ``media_id`` hash before a decode stage so each task holds a bounded
  byte budget, never ``coalesce`` after a filter on size.

Decoders: ``decoder="fake"`` produces a deterministic synthetic decode
(seeded by the bytes' md5) — the oracle-matched path, since DuckDB can
re-derive it in SQL. ``decoder="real"`` decodes actual media via
``media_codecs``: PIL / soundfile when importable, with pure-stdlib
fallbacks (PNG via zlib+struct, baseline JPEG via ``jpeg_codec``, PCM
WAV via wave, MJPEG-AVI video via ``avi_codec``) so all three
modalities decode even in this codec-less container. Other video
containers (MP4/H.264...) still raise NotImplementedError unless PyAV
is present.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried next to every media blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # jpeg|png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int, float, str]:
    """Deterministic synthetic decode: dimensions/luma/phash derived from
    the md5 of the bytes — stable across engines, workers, and runs.
    ``mean_luma`` is k/65535.0 unrounded: the same IEEE double comes out of
    any engine, so oracle hashes match bit-for-bit."""
    h = hashlib.md5(content or b"").hexdigest()
    width = 64 + int(h[:4], 16) % 1984
    height = 64 + int(h[4:8], 16) % 1984
    mean_luma = int(h[8:12], 16) / 65535.0
    return width, height, mean_luma, h[:16]


def image_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: str = "fake",
) -> DataFrame:
    """Decode images and emit per-image features (dims, luma, phash).

    Arrow-batched; one decode per row inside the batch loop. The returned
    plan repartitions by id first so decode work (CPU + bytes) spreads
    evenly regardless of upstream file layout.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def fake(content: bytes):
            h = _hashlib.md5(content or b"").hexdigest()
            return (
                64 + int(h[:4], 16) % 1984,
                64 + int(h[4:8], 16) % 1984,
                int(h[8:12], 16) / 65535.0,
                h[:16],
            )

        for pdf in batches:
            if decoder == "real":
                # PIL when importable, stdlib PNG fallback otherwise
                from wopen_spark.media_codecs import average_hash, decode_image, mean_luma

                def real(content: bytes):
                    px = decode_image(bytes(content or b""))
                    return px.shape[1], px.shape[0], mean_luma(px), average_hash(px)

                feats = [real(b) for b in pdf[content_col]]
            else:
                feats = [fake(b) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_luma": [f[2] for f in feats],
                    "phash": [f[3] for f in feats],
                }
            )

    return df.repartition(id_col).mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_windows", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak_window", T.IntegerType()),
    ]
)


def audio_features(
    df: DataFrame,
    window_ms: int = 250,
    content_col: str = "content",
    id_col: str = "media_id",
    duration_col: str = "meta.duration_ms",
    decoder: str = "fake",
) -> DataFrame:
    """Audio feature extraction: windowed loudness stats per clip.

    Same Arrow-batched shape as the image stages. The fake decoder derives
    a per-window amplitude from md5(bytes + window index) and reports
    overall RMS plus the loudest window — ``decoder='real'`` is where
    soundfile/librosa frame-level energy belongs. Window amplitudes are
    k/65535 with k a 16-bit int, so RMS is exactly reproducible in SQL.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    flat = df.select(
        F.col(id_col),
        F.col(content_col).alias("content"),
        F.col(duration_col).alias("duration_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import math as _math

        for pdf in batches:
            if decoder == "real":
                # soundfile when importable, stdlib wave (PCM WAV) otherwise;
                # duration comes from the decoded samples, not the metadata
                from wopen_spark.media_codecs import audio_window_stats

                yield pd.DataFrame(
                    [
                        (mid, *audio_window_stats(bytes(content or b""), window_ms))
                        for mid, content in zip(pdf[id_col], pdf["content"])
                    ],
                    columns=["media_id", "duration_ms", "n_windows", "rms", "peak_window"],
                )
                continue
            rows = []
            for mid, content, duration in zip(
                pdf[id_col], pdf["content"], pdf["duration_ms"]
            ):
                dur = int(duration or 0)
                n = max(dur // window_ms, 0)
                base = content or b""
                amps = [
                    int(
                        _hashlib.md5(base + b"w" + str(i).encode()).hexdigest()[:4], 16
                    )
                    / 65535.0
                    for i in range(n)
                ]
                rms = _math.sqrt(sum(a * a for a in amps) / n) if n else 0.0
                peak = max(range(n), key=lambda i: (amps[i], -i)) if n else -1
                rows.append((mid, dur, n, rms, peak))
            yield pd.DataFrame(
                {
                    "media_id": [r[0] for r in rows],
                    "duration_ms": [r[1] for r in rows],
                    "n_windows": [r[2] for r in rows],
                    "rms": [r[3] for r in rows],
                    "peak_window": [r[4] for r in rows],
                }
            )

    return flat.repartition(id_col).mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: str = "fake",
) -> DataFrame:
    """Resize stage: emit new media rows with target dimensions.

    Arrow-batched mapInPandas, same scale shape as image_features. The
    fake decoder emits a deterministic 16-byte surrogate for the resized
    pixels — md5(original_bytes + 'WxH') — so the full pipeline stays
    re-derivable in SQL; ``decoder='real'`` is the seam where
    PIL's Image.resize belongs.
    """
    if decoder not in ("fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    tag = f"{width}x{height}".encode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            if decoder == "real":
                # PIL bilinear when importable; stdlib nearest-neighbor PNG
                from wopen_spark.media_codecs import resize_image

                content = [
                    resize_image(bytes(b or b""), width, height)
                    for b in pdf[content_col]
                ]
            else:
                content = [
                    _hashlib.md5((b or b"") + tag).digest() for b in pdf[content_col]
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "content": content,
                    "width": width,
                    "height": height,
                }
            )

    return df.repartition(id_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    content_col: str = "content",
    id_col: str = "media_id",
    duration_col: str = "meta.duration_ms",
    decoder: str = "fake",
) -> DataFrame:
    """Explode each video row into sampled frame rows (one per ``every_ms``).

    Row-expanding mapInPandas: output batches are built per input row so a
    long video cannot blow past the Arrow batch budget. The fake decoder
    emits one synthetic 16-byte frame blob per sample point derived from
    (bytes, frame_idx).
    """

    flat = df.select(
        F.col(id_col), F.col(content_col).alias("content"), F.col(duration_col).alias("duration_ms")
    )

    # cap output batch size so a batch of long videos can't blow the Arrow
    # transfer budget even though each input row may expand many-fold
    max_out = 4096

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def flush(buf):
            return pd.DataFrame(
                {
                    "media_id": [r[0] for r in buf],
                    "frame_idx": [r[1] for r in buf],
                    "frame_ms": [r[2] for r in buf],
                    "frame": [r[3] for r in buf],
                }
            )

        for pdf in batches:
            if decoder == "real":
                # MJPEG-in-AVI demuxes with the pure-stdlib RIFF walker and
                # per-frame JPEG payloads are emitted WITHOUT decoding them
                # (downstream decodes only kept frames); other containers
                # (MP4/H.264...) genuinely need PyAV/ffmpeg
                from wopen_spark.avi_codec import mjpeg_frame_blobs

                buf = []
                for mid, content in zip(pdf[id_col], pdf["content"]):
                    blob = bytes(content or b"")
                    if blob[:4] != b"RIFF":
                        try:
                            import av  # noqa: F401, PLC0415
                        except ImportError as e:
                            raise NotImplementedError(
                                "only MJPEG-AVI demuxes without PyAV/ffmpeg; "
                                "MP4/H.264 need a real codec library"
                            ) from e
                        raise NotImplementedError(
                            "PyAV frame extraction not wired; use MJPEG-AVI"
                        )
                    fps, jpegs = mjpeg_frame_blobs(blob)
                    duration_ms = len(jpegs) * 1000.0 / fps
                    i = 0
                    while i * every_ms < duration_ms:
                        src = min(int(i * every_ms * fps / 1000.0), len(jpegs) - 1)
                        buf.append((mid, i, i * every_ms, jpegs[src]))
                        i += 1
                    if len(buf) >= max_out:
                        yield flush(buf)
                        buf = []
                if buf:
                    yield flush(buf)
                continue
            buf: list[tuple] = []
            # plain zip loop: iterrows() materializes a Series per row and
            # dominated the stage wall-clock (measured ~10x)
            for mid, content, duration in zip(
                pdf[id_col], pdf["content"], pdf["duration_ms"]
            ):
                n = max(int(duration or 0) // every_ms, 0)
                base = content or b""
                buf.extend(
                    (mid, i, i * every_ms, _hashlib.md5(base + str(i).encode()).digest())
                    for i in range(n)
                )
                if len(buf) >= max_out:
                    yield flush(buf)
                    buf = []
            if buf:
                yield flush(buf)

    return flat.repartition(id_col).mapInPandas(run, schema=FRAME_SCHEMA)


def synthetic_media(spark, n: int = 100, media_type: str = "image") -> DataFrame:
    """Deterministic fake media table for tests/benchmarks: content bytes
    are the md5 digest of the id (16 bytes standing in for a blob)."""
    ids = spark.range(n).select(F.col("id").alias("media_id"))
    content = F.unhex(F.md5(F.col("media_id").cast("string")))
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit("fake").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("media_id") % 10 * 1000 + 500).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return ids.select("media_id", content.alias("content"), meta.alias("meta"))
