"""Pure-stdlib baseline JPEG codec tests (wopen_spark.jpeg_codec).

No PIL in this container, so the encoder synthesizes the fixtures and
the decoder is validated by roundtrip error bounds (JPEG is lossy; the
orthonormal DCT makes quantization the only error source, so smooth
images bound tightly) plus structural checks: byte stuffing, restart
markers, subsampling paths, and honest NotImplementedError on
non-baseline processes.
"""

from __future__ import annotations

import numpy as np
import pytest

from wopen_spark.jpeg_codec import jpeg_decode, jpeg_encode


def _gradient_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 / max(w - 1, 1),
            yy * 255 / max(h - 1, 1),
            (xx + yy) * 255 / max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_rgb_444_roundtrip_bounded_error():
    img = _gradient_rgb(37, 53)  # non-multiple-of-8 dims on purpose
    dec = jpeg_decode(jpeg_encode(img, quality=92, subsampling="4:4:4"))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 24 and err.mean() <= 4.0


def test_rgb_420_subsampled_roundtrip():
    img = _gradient_rgb(37, 53)  # odd dims exercise chroma edge padding
    dec = jpeg_decode(jpeg_encode(img, quality=92, subsampling="4:2:0"))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 40 and err.mean() <= 6.0


def test_flat_color_near_exact():
    img = np.full((16, 24, 3), 77, dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=90))
    assert np.abs(dec.astype(int) - 77).max() <= 2


def test_grayscale_and_restart_markers():
    yy = np.mgrid[0:41, 0:29][0]
    g = (yy * 255 / 40).astype(np.uint8)
    blob = jpeg_encode(g, quality=90, restart_interval=2)
    assert any(
        blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7
        for i in range(len(blob) - 1)
    ), "restart markers must be present in the stream"
    dec = jpeg_decode(blob)
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 4


def test_byte_stuffing_on_noise():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    blob = jpeg_encode(img, quality=95)
    assert b"\xff\x00" in blob[20:], "entropy stream should contain stuffed 0xFF"
    dec = jpeg_decode(blob)  # decodes without marker confusion
    assert dec.shape == img.shape


def test_progressive_rejected_honestly():
    img = _gradient_rgb(16, 16)
    blob = bytearray(jpeg_encode(img))
    # rewrite SOF0 (FFC0) to SOF2 (FFC2, progressive)
    i = blob.find(b"\xff\xc0")
    assert i > 0
    blob[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF2"):
        jpeg_decode(bytes(blob))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x89PNG\r\n")


def test_decode_image_dispatches_jpeg_and_resize_keeps_format():
    from wopen_spark.media_codecs import decode_image, resize_image

    img = _gradient_rgb(24, 32)
    blob = jpeg_encode(img, quality=92)
    arr = decode_image(blob)
    assert arr.shape[:2] == (24, 32)
    small = resize_image(blob, 16, 12)
    assert small[:2] == b"\xff\xd8"  # still a JPEG
    assert decode_image(small).shape[:2] == (12, 16)
