"""Multimodal-pipeline queries: binary media columns through Arrow-batched
mapInPandas decode stages (wopen_spark.multimodal).

Media is synthesized deterministically from the documents table (content =
the text's UTF-8 bytes, duration from doc_id) so the fake-decode outputs —
md5-derived dimensions/luma/phash and per-frame digests — are re-derivable
in DuckDB SQL and the whole mapInPandas plumbing is oracle-checked
value-for-value, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.multimodal import image_features, sample_frames
from wopen_spark.queries.registry import _per_distinct_text, _spread, _t, query

# DuckDB: hex-nibble slice of md5(text) -> int  (Spark: conv(substr,16,10))
def _duck_hex_int(start: int, n: int) -> str:
    return f"CAST(('0x' || substr(md5(text), {start}, {n})) AS BIGINT)"


def _media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> MEDIA_SCHEMA-shaped table: content is the text's UTF-8
    bytes, duration_ms derives from doc_id (0.5-9.5s)."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("doc_id") % 10 * 1000 + 500).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        meta.alias("meta"),
    )


@query(
    "media_image_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           64 + ({_duck_hex_int(1, 4)} % 1984) AS width,
           64 + ({_duck_hex_int(5, 4)} % 1984) AS height,
           {_duck_hex_int(9, 4)} / 65535.0 AS mean_luma,
           substr(md5(text), 1, 16) AS phash
    FROM documents ORDER BY media_id
    """,
)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media_from_documents(spark, sf_dir)
    feats = image_features(media, decoder="fake")
    return feats.select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_luma",
        "phash",
    ).orderBy("media_id")


@query(
    "media_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(i AS INT) AS frame_idx,
           CAST(i * 1000 AS BIGINT) AS frame_ms,
           md5(text || CAST(i AS VARCHAR)) AS frame_md5
    FROM documents, unnest(range(0, doc_id % 10)) AS t(i)
    ORDER BY media_id, frame_idx
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding frame sampler: duration (doc_id%10)*1000+500 at one
    frame per second yields doc_id%10 frames; frame bytes are
    md5(content + frame_idx) so DuckDB re-derives their hex."""
    media = _media_from_documents(spark, sf_dir)
    frames = sample_frames(media, every_ms=1000, decoder="fake")
    return frames.select(
        "media_id",
        "frame_idx",
        "frame_ms",
        F.lower(F.hex(F.col("frame"))).alias("frame_md5"),
    ).orderBy("media_id", "frame_idx")


@query(
    "media_resize",
    oracle="""
    SELECT doc_id AS media_id,
           md5(text || '128x128') AS resized_md5,
           CAST(128 AS INT) AS width,
           CAST(128 AS INT) AS height
    FROM documents ORDER BY media_id
    """,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage over documents-derived media; the fake resized bytes
    are md5(content + 'WxH') so DuckDB re-derives their hex."""
    from wopen_spark.multimodal import resize_images

    media = _media_from_documents(spark, sf_dir)
    out = resize_images(media, 128, 128, decoder="fake")
    return out.select(
        "media_id",
        F.lower(F.hex(F.col("content"))).alias("resized_md5"),
        "width",
        "height",
    ).orderBy("media_id")


@query(
    "media_audio_features",
    oracle="""
    WITH m AS (
      SELECT doc_id, text, CAST((doc_id % 10) * 1000 + 500 AS BIGINT) AS duration_ms
      FROM documents
    ),
    amps AS (
      SELECT doc_id, duration_ms,
             CAST(duration_ms // 250 AS INT) AS n_windows,
             list_transform(range(0, duration_ms // 250),
               i -> CAST(('0x' || substr(md5(text || 'w' || CAST(i AS VARCHAR)), 1, 4)) AS BIGINT) / 65535.0) AS a
      FROM m
    )
    SELECT doc_id AS media_id, duration_ms, n_windows,
           sqrt(list_aggregate(list_transform(a, x -> x * x), 'sum') / n_windows) AS rms,
           CAST(list_indexof(a, list_max(a)) - 1 AS INT) AS peak_window
    FROM amps ORDER BY media_id
    """,
)
def media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio loudness over documents-derived clips: per-window
    amplitudes are md5-derived 16-bit fractions, so RMS and the argmax
    window are bit-reproducible in SQL."""
    from wopen_spark.multimodal import audio_features

    media = _media_from_documents(spark, sf_dir)
    return audio_features(media, window_ms=250, decoder="fake").orderBy("media_id")


@query(
    "media_real_png_roundtrip",
    oracle="""
    WITH px AS (
      SELECT doc_id, md5(text) || md5(text || 'a') || md5(text || 'b') AS h
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(4 AS INT) AS width,
           CAST(4 AS INT) AS height,
           CAST(list_aggregate(list_transform(range(0, 16),
             i -> CAST(('0x' || substr(h, i*6 + 1, 2)) AS BIGINT)), 'sum') AS BIGINT) AS sum_r,
           CAST(list_aggregate(list_transform(range(0, 16),
             i -> CAST(('0x' || substr(h, i*6 + 3, 2)) AS BIGINT)), 'sum') AS BIGINT) AS sum_g,
           CAST(list_aggregate(list_transform(range(0, 16),
             i -> CAST(('0x' || substr(h, i*6 + 5, 2)) AS BIGINT)), 'sum') AS BIGINT) AS sum_b,
           h AS pixels_hex
    FROM px ORDER BY media_id
    """,
)
def media_real_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode in the correctness gate (r4 verdict #5): every other
    media oracle sees only the deterministic fake decoder; this one
    exercises the pure-stdlib PNG codec (media_codecs.png_decode —
    zlib+struct over RFC 2083, no PIL required). Per document a 4x4 RGB
    PNG is encoded from 48 md5-derived pixel bytes, decoded back through
    png_decode, and the DECODED pixels' hex must equal the md5-derived
    source byte-for-byte — plus IHDR-parsed dimensions and integer
    channel sums DuckDB recomputes from the same hex."""
    import pandas as pd  # noqa: PLC0415 — worker-side import pattern

    from pyspark.sql import types as T

    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")
    schema = T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sum_r", T.LongType()),
            T.StructField("sum_g", T.LongType()),
            T.StructField("sum_b", T.LongType()),
            T.StructField("pixels_hex", T.StringType()),
        ]
    )

    def run(batches):
        import hashlib

        import numpy as np

        from wopen_spark.media_codecs import png_decode, png_encode

        for pdf in batches:
            txts, ws, hs, rs, gs, bs, hexes = [], [], [], [], [], [], []
            for text in pdf["text"]:
                t = (text or "").encode("utf-8")
                raw = b"".join(
                    hashlib.md5(t + s).digest() for s in (b"", b"a", b"b")
                )
                px = np.frombuffer(raw, dtype=np.uint8).reshape(4, 4, 3)
                arr = png_decode(png_encode(px))
                txts.append(text)
                hs.append(int(arr.shape[0]))
                ws.append(int(arr.shape[1]))
                rs.append(int(arr[:, :, 0].sum()))
                gs.append(int(arr[:, :, 1].sum()))
                bs.append(int(arr[:, :, 2].sum()))
                hexes.append(arr.tobytes().hex())
            yield pd.DataFrame(
                {
                    "text": txts,
                    "width": ws,
                    "height": hs,
                    "sum_r": rs,
                    "sum_g": gs,
                    "sum_b": bs,
                    "pixels_hex": hexes,
                }
            )

    # codec runs once per DISTINCT text (the pixels derive from the text
    # alone); every clone inherits through the clone-collapse rejoin
    out = _per_distinct_text(d, lambda t: t.mapInPandas(run, schema))
    return out.select(
        F.col("doc_id").alias("media_id"),
        "width",
        "height",
        "sum_r",
        "sum_g",
        "sum_b",
        "pixels_hex",
    ).orderBy("media_id")


@query(
    "media_real_wav_roundtrip",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_transform(range(0, 160), i ->
               (CAST(('0x' || substr(md5(text || 'w' || CAST(i // 16 AS VARCHAR)),
                                     (i % 16) * 2 + 1, 2)) AS BIGINT) - 128)
               * 256.0 / 32768.0) AS smp
      FROM documents
    ),
    w AS (
      SELECT doc_id, smp,
             list_transform(range(0, 4), k ->
               sqrt(list_aggregate(list_transform(smp[k*40+1 : k*40+40],
                                                  x -> x * x), 'sum') / 40.0)
             ) AS wrms
      FROM s
    )
    SELECT doc_id AS media_id,
           CAST(20 AS BIGINT) AS duration_ms,
           CAST(4 AS INT) AS n_windows,
           round(sqrt(list_aggregate(list_transform(smp, x -> x * x), 'sum')
                      / 160.0), 6) AS rms,
           CAST(list_indexof(wrms, list_max(wrms)) - 1 AS INT) AS peak_window
    FROM w ORDER BY media_id
    """,
)
def media_real_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode in the gate (no soundfile): per document 160
    int16 samples are derived from md5 bytes, written as an 8 kHz PCM
    WAV with the stdlib ``wave`` writer, and decoded back through
    media_codecs.audio_window_stats (stdlib ``wave`` reader) — duration,
    window count, full-clip RMS, and the loudest 5 ms window must match
    DuckDB's re-derivation from the same md5 bytes. int16/32768 is
    exactly representable, so the only cross-engine wiggle is summation
    order — absorbed by round-6 like the percentile queries."""
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql import types as T

    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")
    schema = T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("n_windows", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak_window", T.IntegerType()),
        ]
    )

    def run(batches):
        import hashlib
        import io
        import wave

        from wopen_spark.media_codecs import audio_window_stats

        for pdf in batches:
            rows = {k: [] for k in ("text", "duration_ms", "n_windows", "rms", "peak_window")}
            for text in pdf["text"]:
                t = (text or "").encode("utf-8")
                raw = b"".join(
                    hashlib.md5(t + f"w{g}".encode()).digest() for g in range(10)
                )
                pcm = b"".join(
                    int((b - 128) * 256).to_bytes(2, "little", signed=True)
                    for b in raw
                )
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(8000)
                    wf.writeframes(pcm)
                dur, n, rms, peak = audio_window_stats(buf.getvalue(), 5)
                rows["text"].append(text)
                rows["duration_ms"].append(int(dur))
                rows["n_windows"].append(int(n))
                rows["rms"].append(round(rms, 6))
                rows["peak_window"].append(int(peak))
            yield pd.DataFrame(rows)

    # encode+decode once per DISTINCT text — every derived value is a
    # pure function of the text bytes; clones inherit via the rejoin
    out = _per_distinct_text(d, lambda t: t.mapInPandas(run, schema))
    return out.select(
        F.col("doc_id").alias("media_id"),
        "duration_ms",
        "n_windows",
        "rms",
        "peak_window",
    ).orderBy("media_id")


@query(
    "media_real_jpeg_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) AS r,
           CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT) AS g,
           CAST(('0x' || substr(md5(text), 5, 2)) AS BIGINT) AS b,
           CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
           true AS jpeg_ok
    FROM documents ORDER BY media_id
    """,
)
def media_real_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG codec in the gate (no PIL): per document a 16x16
    constant-color RGB image (color = first md5 bytes of the text) is
    encoded by the pure-stdlib encoder and decoded back by the
    pure-stdlib decoder, worker-side under mapInPandas. JPEG is lossy so
    the decoded bytes aren't SQL-rederivable; instead the engine emits a
    self-checking property — shape preserved AND max per-pixel error <= 2
    (a constant image is DC-only, so quantization error is bounded by
    rounding) — and the oracle pins it true for EVERY row: one failed
    decode anywhere in the corpus flips the hash."""
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql import types as T

    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")
    schema = T.StructType(
        [
            T.StructField("text", T.StringType()),
            T.StructField("r", T.LongType()),
            T.StructField("g", T.LongType()),
            T.StructField("b", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("jpeg_ok", T.BooleanType()),
        ]
    )

    def run(batches):
        import hashlib

        import numpy as np

        from wopen_spark.jpeg_codec import jpeg_decode, jpeg_encode

        for pdf in batches:
            rows = {k: [] for k in ("text", "r", "g", "b", "width", "height", "jpeg_ok")}
            for text in pdf["text"]:
                dig = hashlib.md5((text or "").encode("utf-8")).digest()
                r, g, b = dig[0], dig[1], dig[2]
                img = np.empty((16, 16, 3), dtype=np.uint8)
                img[..., 0], img[..., 1], img[..., 2] = r, g, b
                dec = jpeg_decode(jpeg_encode(img, quality=90))
                ok = (
                    dec.shape == (16, 16, 3)
                    and int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2
                )
                rows["text"].append(text)
                rows["r"].append(int(r))
                rows["g"].append(int(g))
                rows["b"].append(int(b))
                rows["width"].append(dec.shape[1])
                rows["height"].append(dec.shape[0])
                rows["jpeg_ok"].append(bool(ok))
            yield pd.DataFrame(rows)

    # the pure-Python DCT pipeline is the expensive part — run it once
    # per DISTINCT text (the image is a function of the text's md5) and
    # let clones inherit through the clone-collapse rejoin
    out = _per_distinct_text(d, lambda t: t.mapInPandas(run, schema))
    return out.select(
        F.col("doc_id").alias("media_id"),
        "r",
        "g",
        "b",
        "width",
        "height",
        "jpeg_ok",
    ).orderBy("media_id")
