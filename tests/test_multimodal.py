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


def test_real_decoder_raises_not_implemented(spark):
    media = synthetic_media(spark, 2)
    with pytest.raises(Exception, match="NotImplementedError|not available"):
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
    with pytest.raises(Exception, match="NotImplementedError|not available"):
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
