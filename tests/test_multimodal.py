"""Plumbing tests for the multimodal binary-column operators.

The decode kernels are stubs (no codec libs in this container); what these
tests pin down is the Spark-side contract: schemas, Arrow batch shapes,
row expansion, determinism across partitionings, and the real-decoder
escape hatch.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from wopen_spark.multimodal import (
    FRAME_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    image_features,
    sample_frames,
    synthetic_media,
)


def test_synthetic_media_content_is_md5_of_id(spark):
    rows = {r.media_id: r for r in synthetic_media(spark, 10).collect()}
    assert len(rows) == 10
    assert rows[3].content == hashlib.md5(b"3").digest()
    assert rows[3].meta.duration_ms == 3500


def test_image_features_schema_and_determinism(spark):
    media = synthetic_media(spark, 50)
    feats = image_features(media, decoder="fake")
    assert feats.schema == IMAGE_FEATURES_SCHEMA
    got = {r.media_id: r for r in feats.collect()}
    assert len(got) == 50
    # independent of partitioning: same values from a 1-partition run
    got1 = {r.media_id: r for r in image_features(media.coalesce(1), decoder="fake").collect()}
    assert got == got1
    # spot-check the fake decode against a driver-side reimplementation
    h = hashlib.md5(hashlib.md5(b"7").digest()).hexdigest()
    assert got[7].width == 64 + int(h[:4], 16) % 1984
    assert got[7].phash == h[:16]


def test_sample_frames_row_expansion(spark):
    media = synthetic_media(spark, 20)
    frames = sample_frames(media, every_ms=1000, decoder="fake")
    assert frames.schema == FRAME_SCHEMA
    pdf = frames.toPandas()
    # media_id m has duration m%10*1000+500 -> m%10 frames; id 0 and 10 drop out
    assert len(pdf) == sum(m % 10 for m in range(20))
    g = pdf[pdf.media_id == 7].sort_values("frame_idx")
    assert list(g.frame_idx) == list(range(7))
    assert list(g.frame_ms) == [i * 1000 for i in range(7)]
    content = hashlib.md5(b"7").digest()
    assert bytes(g.frame.iloc[2]) == hashlib.md5(content + b"2").digest()


def test_real_decoder_rejects_non_media_bytes(spark):
    # synthetic_media content is raw md5 bytes, not a decodable image:
    # the real decoder must fail loudly, not fabricate features
    media = synthetic_media(spark, 2)
    with pytest.raises(Exception, match="not a PNG|NotImplementedError|only PNG"):
        image_features(media, decoder="real").collect()
    with pytest.raises(ValueError):
        image_features(media, decoder="nope")


def test_resize_images_plumbing(spark):
    from wopen_spark.multimodal import resize_images

    media = synthetic_media(spark, 10)
    out = resize_images(media, 64, 32, decoder="fake").collect()
    assert len(out) == 10
    r = {x.media_id: x for x in out}[3]
    assert (r.width, r.height) == (64, 32)
    assert bytes(r.content) == hashlib.md5(hashlib.md5(b"3").digest() + b"64x32").digest()
    with pytest.raises(Exception, match="not a PNG|NotImplementedError|only PNG"):
        resize_images(media, 64, 32, decoder="real").collect()


def test_audio_features_plumbing(spark):
    import math

    from wopen_spark.multimodal import audio_features, synthetic_media

    media = synthetic_media(spark, 10, media_type="audio")
    out = {r.media_id: r for r in audio_features(media, window_ms=250).collect()}
    r = out[3]  # duration 3500ms -> 14 windows
    assert r.n_windows == 14
    base = hashlib.md5(b"3").digest()
    amps = [
        int(hashlib.md5(base + b"w" + str(i).encode()).hexdigest()[:4], 16) / 65535.0
        for i in range(14)
    ]
    assert abs(r.rms - math.sqrt(sum(a * a for a in amps) / 14)) < 1e-12
    assert r.peak_window == max(range(14), key=lambda i: (amps[i], -i))


# ---------------------------------------------------------------------------
# Real codecs (media_codecs.py): stdlib PNG/WAV paths run everywhere; the
# PIL test only runs where Pillow is installed.
# ---------------------------------------------------------------------------


def _checker_png():
    """4x4 RGB checkerboard with known mean luma, via the stdlib encoder."""
    import numpy as np

    from wopen_spark.media_codecs import png_encode

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[::2, ::2] = [255, 0, 0]     # red
    px[1::2, 1::2] = [0, 0, 255]   # blue
    return px, png_encode(px)


def test_png_codec_roundtrip_all_filters():
    """Decode must undo every PNG row filter (0-4), not just filter 0:
    hand-build IDAT streams per filter and check the recovered pixels."""
    import struct
    import zlib

    import numpy as np

    from wopen_spark.media_codecs import _PNG_MAGIC, png_decode

    rng = np.random.default_rng(42)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)

    def build_png(pixels, filt):
        h, w, ch = pixels.shape
        raw = bytearray()
        prev = np.zeros(w * ch, dtype=np.int32)
        for y in range(h):
            line = pixels[y].reshape(-1).astype(np.int32)
            out = np.empty_like(line)
            for x in range(w * ch):
                left = int(line[x - ch]) if x >= ch else 0
                up = int(prev[x])
                ul = int(prev[x - ch]) if x >= ch else 0
                if filt == 0:
                    out[x] = line[x]
                elif filt == 1:
                    out[x] = (line[x] - left) % 256
                elif filt == 2:
                    out[x] = (line[x] - up) % 256
                elif filt == 3:
                    out[x] = (line[x] - ((left + up) >> 1)) % 256
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    out[x] = (line[x] - pred) % 256
            raw.append(filt)
            raw.extend(out.astype(np.uint8).tobytes())
            prev = line

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            _PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    for filt in range(5):
        got = png_decode(build_png(px, filt))
        assert (got == px).all(), f"filter {filt} mis-decoded"


def test_png_encode_decode_identity():
    import numpy as np

    from wopen_spark.media_codecs import png_decode, png_encode

    for ch in (1, 2, 3, 4):
        px = np.random.default_rng(ch).integers(0, 256, size=(7, 3, ch), dtype=np.uint8)
        assert (png_decode(png_encode(px)) == px).all()


def test_image_features_real_decodes_png(spark):
    import numpy as np

    from wopen_spark.media_codecs import average_hash
    from wopen_spark.multimodal import image_features

    px, png = _checker_png()
    df = spark.createDataFrame([(1, bytearray(png))], "media_id long, content binary")
    (r,) = image_features(df, decoder="real").collect()
    assert (r.width, r.height) == (4, 4)
    # 4 red + 4 blue of 16 pixels: (4*0.299 + 4*0.114) * 255/255 / 16
    expected_luma = (4 * 0.299 * 255 + 4 * 0.114 * 255) / 16 / 255.0
    assert abs(r.mean_luma - expected_luma) < 1e-9
    assert r.phash == average_hash(px)


def test_resize_images_real_nearest_neighbor(spark):
    import numpy as np

    from wopen_spark.media_codecs import png_decode
    from wopen_spark.multimodal import resize_images

    px, png = _checker_png()
    df = spark.createDataFrame([(1, bytearray(png))], "media_id long, content binary")
    (r,) = resize_images(df, 2, 2, decoder="real").collect()
    got = png_decode(bytes(r.content))
    assert got.shape == (2, 2, 3)
    # nearest-neighbor of the checkerboard keeps the even-row/col samples
    assert (got == px[::2, ::2]).all()


def test_audio_features_real_wav(spark):
    import io
    import math
    import struct
    import wave

    from wopen_spark.multimodal import audio_features

    # 1 kHz-rate mono WAV, 1.0 s: first half amplitude 0.25, second 0.5
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(1000)
        samples = [8192] * 500 + [16384] * 500
        wf.writeframes(struct.pack("<1000h", *samples))
    wav = buf.getvalue()

    # meta duration deliberately wrong (0): real decoder must derive it
    # from the samples, not the metadata
    df = spark.createDataFrame(
        [(7, bytearray(wav), (0,))],
        "media_id long, content binary, meta struct<duration_ms: long>",
    )
    (r,) = audio_features(df, window_ms=250, decoder="real").collect()
    assert r.duration_ms == 1000
    assert r.n_windows == 4
    assert r.peak_window == 2  # first 0.5-amplitude window
    expected_rms = math.sqrt((500 * 0.25**2 + 500 * 0.5**2) / 1000)
    assert abs(r.rms - expected_rms) < 1e-4


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None,
    reason="Pillow not installed",
)
def test_image_features_real_via_pil(spark):
    """Where Pillow exists, the PIL path decodes a real 1x1 PNG."""
    import io

    from PIL import Image

    from wopen_spark.multimodal import image_features

    buf = io.BytesIO()
    Image.new("RGB", (1, 1), (255, 255, 255)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "media_id long, content binary"
    )
    (r,) = image_features(df, decoder="real").collect()
    assert (r.width, r.height) == (1, 1)
    assert abs(r.mean_luma - 1.0) < 1e-9
