"""MJPEG-AVI codec + real video frame sampling tests (no PyAV/ffmpeg).

The RIFF walker and the baseline JPEG codec together give video a real
stdlib decode path; these pin the container roundtrip and the Spark
``sample_frames(decoder='real')`` stage end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from wopen_spark.avi_codec import (
    mjpeg_avi_decode,
    mjpeg_avi_encode,
    mjpeg_frame_blobs,
)


def _frames(n: int, h: int = 24, w: int = 32) -> list[np.ndarray]:
    out = []
    for i in range(n):
        f = np.full((h, w, 3), 30 * i % 256, dtype=np.uint8)
        f[:, :, 1] = (10 + 40 * i) % 256
        out.append(f)
    return out


def test_avi_roundtrip_preserves_frames_and_fps():
    frames = _frames(5)
    blob = mjpeg_avi_encode(frames, fps=4, quality=92)
    fps, dec = mjpeg_avi_decode(blob)
    assert fps == pytest.approx(4.0, abs=0.01)
    assert len(dec) == 5
    for src, got in zip(frames, dec):
        assert got.shape == src.shape
        assert np.abs(got.astype(int) - src.astype(int)).max() <= 3


def test_frame_blobs_are_standalone_jpegs():
    from wopen_spark.jpeg_codec import jpeg_decode

    blob = mjpeg_avi_encode(_frames(3), fps=2)
    fps, jpegs = mjpeg_frame_blobs(blob)
    assert fps == pytest.approx(2.0, abs=0.01)
    assert len(jpegs) == 3
    assert all(j[:2] == b"\xff\xd8" for j in jpegs)
    assert jpeg_decode(jpegs[0]).shape == (24, 32, 3)


def test_not_an_avi_rejected():
    with pytest.raises(ValueError, match="RIFF"):
        mjpeg_avi_decode(b"\x00" * 64)


def test_sample_frames_real_decoder_over_spark(spark):
    """End-to-end: binary AVI column -> sample_frames(decoder='real') on
    workers -> one frame row per second, each a decodable JPEG of the
    right source frame."""
    from wopen_spark.jpeg_codec import jpeg_decode
    from wopen_spark.multimodal import MEDIA_SCHEMA, sample_frames

    frames = _frames(8)  # 8 frames at 4 fps = 2.0 s
    blob = mjpeg_avi_encode(frames, fps=4, quality=92)
    rows = [
        (1, bytearray(blob), ("video", "avi", None, None, 2000, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = (
        sample_frames(media, every_ms=500, decoder="real")
        .orderBy("frame_idx")
        .collect()
    )
    # ticks at 0, 500, 1000, 1500 ms -> source frames 0, 2, 4, 6
    assert [(r.frame_idx, r.frame_ms) for r in got] == [
        (0, 0), (1, 500), (2, 1000), (3, 1500),
    ]
    for r, src_idx in zip(got, [0, 2, 4, 6]):
        dec = jpeg_decode(bytes(r.frame))
        assert (
            np.abs(dec.astype(int) - frames[src_idx].astype(int)).max() <= 3
        )


def test_sample_frames_real_non_avi_raises(spark):
    from wopen_spark.multimodal import MEDIA_SCHEMA, sample_frames

    rows = [(1, bytearray(b"\x00\x00\x00\x18ftypmp42"), ("video", "mp4", None, None, 1000, None))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    with pytest.raises(Exception, match="PyAV|MJPEG"):
        sample_frames(media, every_ms=500, decoder="real").collect()
