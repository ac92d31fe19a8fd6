"""Motion-JPEG AVI: a real compressed VIDEO container, decoded pure-python.

Completes the video story: raw-RGB payloads were the only really-decoded
video; MJPEG-in-AVI (the classic camera/capture format, RIFF 'AVI ' with
one baseline/progressive JPEG per '##dc' chunk) now decodes through the
module's own RIFF walker + pipeline/jpeg.py. H.264/VP9/... remain plugin
territory (their specs are orders of magnitude beyond scope).

decoder
  `mjpeg_frames(payload)` -> iterator of (frame_idx, jpeg_bytes) without
  decoding (cheap container walk; frame COUNT costs no pixel work);
  `decode_mjpeg_frame(payload, idx)` -> one (h, w, 3) frame via
  decode_jpeg. Walks LIST/movi and both bare and 'rec '-wrapped chunks,
  tolerates the idx1 index being absent.

encoder
  `encode_mjpeg(frames, fps)` writes a minimal spec-conformant AVI
  (avih + strl/strh/strf headers, movi chunks, no idx1 — legal, players
  rebuild it) with each frame as an encode_jpeg baseline image. Exists
  for hermetic round-trips.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from enterprise_warp_spark.pipeline.jpeg import decode_jpeg, encode_jpeg


def _chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """RIFF chunk walk: yields (fourcc, body_start, body_size). `end` is
    clamped to the buffer so a malformed oversized LIST size raises the
    module's ValueError downstream, never a struct.error mid-walk."""
    end = min(end, len(data))
    while pos + 8 <= end:
        cc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        yield cc, pos + 8, size
        pos += 8 + size + (size & 1)  # word-aligned


def mjpeg_frames(payload: bytes) -> list[tuple[int, bytes]]:
    """All video frames of an MJPEG AVI as (frame_idx, jpeg_bytes) —
    container walk only, no pixel decode."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    out: list[tuple[int, bytes]] = []
    idx = 0

    def walk(pos: int, end: int) -> None:
        nonlocal idx
        for cc, body, size in _chunks(payload, pos, end):
            if cc == b"LIST":
                ltype = payload[body : body + 4]
                if ltype in (b"movi", b"rec "):
                    walk(body + 4, body + size)
            elif cc[2:4] == b"dc" and size >= 2:
                blob = payload[body : body + size]
                if blob[:2] == b"\xff\xd8":  # a JPEG frame
                    out.append((idx, blob))
                idx += 1

    walk(12, len(payload))
    if not out:
        raise ValueError("AVI contains no MJPEG frames")
    return out


def decode_mjpeg_frame(payload: bytes, frame_idx: int) -> np.ndarray:
    """Decode one frame of an MJPEG AVI -> (h, w, 3) or (h, w) uint8."""
    frames = mjpeg_frames(payload)
    for i, blob in frames:
        if i == frame_idx:
            return decode_jpeg(blob)
    raise IndexError(f"frame {frame_idx} not in AVI ({len(frames)} frames)")


def encode_mjpeg(
    frames: list[np.ndarray], fps: int = 25, quality: int = 90
) -> bytes:
    """uint8 frames (all same (h, w[, 3]) shape) -> MJPEG AVI bytes."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    for f in frames:  # validate BEFORE paying for any JPEG encode
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one size")
    blobs = [encode_jpeg(f, quality=quality) for f in frames]
    return build_mjpeg_avi(blobs, w, h, fps)


def build_mjpeg_avi(blobs: list[bytes], w: int, h: int,
                    fps: int = 25) -> bytes:
    """Container-only builder: wrap PRE-ENCODED JPEG frame payloads in an
    MJPEG AVI (hdrl + movi, no idx1). Lets externally-encoded frames ride
    the same container path encode_mjpeg uses."""
    frames = blobs  # header fields below count frames

    def chunk(cc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    def list_chunk(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0,           # max bytes/s, padding, flags (no idx1 -> no HASINDEX)
        len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIIhhhh",
        0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0, 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", b) for b in blobs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
