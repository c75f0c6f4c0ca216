"""Pure-stdlib MJPEG-in-AVI video codec (RIFF container + jpeg_codec).

Video was the one modality with no stdlib fallback ("frame extraction
needs a container demuxer + codec"). Motion-JPEG in an AVI RIFF
container is the simplest real-world video format that needs neither:
the container is length-prefixed chunks (public RIFF/AVI spec) and each
frame is a standalone baseline JPEG — which ``wopen_spark.jpeg_codec``
decodes. MP4/H.264 still require PyAV/ffmpeg and keep their honest
NotImplementedError.

Encoder writes a minimal single-stream AVI (avih + strh/strf + movi);
decoder is lenient — it walks chunks, takes any ``..dc``/``..db`` movi
entry whose payload starts with a JPEG SOI, and reads fps from avih.
"""

from __future__ import annotations

import struct

import numpy as np

from wopen_spark.jpeg_codec import jpeg_decode, jpeg_encode


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def mjpeg_avi_encode(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """Encode uint8 frames (all same (h, w[, 3]) shape) as an MJPEG AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    blobs = [jpeg_encode(f, quality=quality) for f in frames]
    max_bytes = max(len(b) for b in blobs)

    usec_per_frame = int(1_000_000 / fps)
    avih = struct.pack(
        "<14I",
        usec_per_frame,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags (AVIF_HASINDEX unset; 0x10 = WASCAPTUREFILE, benign)
        len(blobs),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # dwFlags
            0, 0,  # priority, language
            0,  # initial frames
            1,  # dwScale
            fps,  # dwRate  (fps = rate/scale)
            0,  # dwStart
            len(blobs),  # dwLength
            max_bytes,  # suggested buffer
            0,  # quality
            0,  # sample size
            0, 0, w, h,  # rcFrame
        )
    )
    ch = 3 if (frames[0].ndim == 3 and frames[0].shape[2] >= 3) else 1
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        w,
        h,
        1,  # planes
        8 * ch,  # bit count
        b"MJPG",  # compression
        max_bytes,  # size image
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", b) for b in blobs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def mjpeg_avi_decode(data: bytes) -> tuple[float, list[np.ndarray]]:
    """AVI blob -> (fps, decoded frames). Lenient chunk walker."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    fps = 0.0
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if fourcc == b"LIST":
                walk(body_start + 4, body_end)  # skip list type
            elif fourcc == b"avih" and size >= 4:
                (usec,) = struct.unpack("<I", data[body_start : body_start + 4])
                if usec:
                    fps = 1_000_000.0 / usec
            elif fourcc[2:4] in (b"dc", b"db"):
                payload = data[body_start:body_end]
                if payload[:2] == b"\xff\xd8":
                    frames.append(jpeg_decode(payload))
            pos = body_end + (size % 2)

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    if not frames:
        raise ValueError("AVI contains no decodable MJPEG frames")
    return (fps or 1.0), frames


def mjpeg_frame_blobs(data: bytes) -> tuple[float, list[bytes]]:
    """Like :func:`mjpeg_avi_decode` but returns the raw per-frame JPEG
    blobs without decoding them — the cheap path for frame SAMPLING,
    where downstream stages decode only the frames they keep."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    fps = 0.0
    blobs: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if fourcc == b"LIST":
                walk(body_start + 4, body_end)
            elif fourcc == b"avih" and size >= 4:
                (usec,) = struct.unpack("<I", data[body_start : body_start + 4])
                if usec:
                    fps = 1_000_000.0 / usec
            elif fourcc[2:4] in (b"dc", b"db"):
                payload = data[body_start:body_end]
                if payload[:2] == b"\xff\xd8":
                    blobs.append(payload)
            pos = body_end + (size % 2)

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    if not blobs:
        raise ValueError("AVI contains no MJPEG frames")
    return (fps or 1.0), blobs
