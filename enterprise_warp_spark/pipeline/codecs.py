"""Pure-python/numpy media codecs for container-less formats.

Real decoding for every format that needs no external codec library:

  WAV / RIFF PCM   8/16/32-bit integer and 32/64-bit IEEE-float audio
  PPM (P6) / PGM (P5)  binary netpbm images
  raw RGB video    concatenated width*height*3 frames (our canonical
                   uncompressed video layout for parquet BINARY columns)

Compressed formats (JPEG/PNG/MP3/H.264/...) genuinely require codec
libraries that are not in this container; callers fall back to the
documented deterministic stub for those and mark rows `decoded=false`.

These kernels run inside Arrow-batched mapInPandas workers — everything
is numpy on contiguous buffers, no per-sample Python loops.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV / RIFF PCM
# ---------------------------------------------------------------------------

_PCM_DTYPES = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}
_FLOAT_DTYPES = {32: np.dtype("<f4"), 64: np.dtype("<f8")}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to (samples, sample_rate).

    samples is float64 with shape (n_samples, n_channels), scaled to
    [-1, 1]. Supports PCM (format tag 1: 8-bit unsigned, 16/32-bit
    signed little-endian) and IEEE float (tag 3). Walks the chunk list
    properly, so extra chunks (LIST/fact/cue) before `data` are fine.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    pos = 12
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            tag, n_ch, rate, bits = fmt
            if tag == 1 and bits in _PCM_DTYPES:
                raw = np.frombuffer(body, dtype=_PCM_DTYPES[bits])
                if bits == 8:  # unsigned, midpoint 128
                    x = (raw.astype(np.float64) - 128.0) / 128.0
                else:
                    x = raw.astype(np.float64) / float(2 ** (bits - 1))
            elif tag == 3 and bits in _FLOAT_DTYPES:
                x = np.frombuffer(body, dtype=_FLOAT_DTYPES[bits]).astype(np.float64)
            else:
                raise NotImplementedError(
                    f"WAV format tag={tag} bits={bits} needs an external codec"
                )
            n = (len(x) // n_ch) * n_ch
            return x[:n].reshape(-1, n_ch), rate
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    raise ValueError("WAV payload has no data chunk")


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode float samples in [-1, 1] (n_samples,) or (n_samples, n_ch)
    as 16-bit PCM WAV bytes. The test-side twin of decode_wav."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    byte_rate = sample_rate * n_ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate, byte_rate, n_ch * 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def audio_features(samples: np.ndarray, sample_rate: int) -> list[float]:
    """8-dim audio feature vector: [duration_s, n_channels, rms, peak,
    zero_crossing_rate, mean, std, sample_rate]. All vectorized numpy."""
    mono = samples.mean(axis=1)
    n = len(mono)
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    return [
        n / float(sample_rate),
        float(samples.shape[1]),
        float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        float(np.max(np.abs(mono))) if n else 0.0,
        zc,
        float(np.mean(mono)) if n else 0.0,
        float(np.std(mono)) if n else 0.0,
        float(sample_rate),
    ]


# ---------------------------------------------------------------------------
# PPM (P6) / PGM (P5) — binary netpbm
# ---------------------------------------------------------------------------


def _pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse 'magic w h maxval' allowing comments; returns
    (magic, width, height, maxval, data_offset)."""
    tokens, pos = [], 0
    while len(tokens) < 4:
        if pos >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(payload[start:pos])
    pos += 1  # single whitespace byte after maxval, then raster
    magic, w, h, maxval = tokens[0], int(tokens[1]), int(tokens[2]), int(tokens[3])
    return magic, w, h, maxval, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6) to uint8 (h, w, 3) or PGM (P5) to (h, w)."""
    magic, w, h, maxval, off = _pnm_header(payload)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    if magic == b"P6":
        need, shape = w * h * 3, (h, w, 3)
    elif magic == b"P5":
        need, shape = w * h, (h, w)
    else:
        raise NotImplementedError(f"netpbm magic {magic!r} needs an external codec")
    raster = payload[off : off + need]
    if len(raster) < need:
        raise ValueError("truncated netpbm raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(shape)


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode uint8 (h, w, 3) as P6 or (h, w) as P5."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    magic = b"P6" if a.ndim == 3 else b"P5"
    h, w = a.shape[:2]
    return magic + b"\n%d %d\n255\n" % (w, h) + a.tobytes()


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via numpy index sampling (no pixel loops)."""
    h, w = arr.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return arr[rows[:, None], cols[None, :]]


def image_features(arr: np.ndarray) -> list[float]:
    """8-dim image feature vector: [height, width, channels, mean R, mean G,
    mean B, overall mean, overall std] (grayscale repeats the mean)."""
    x = arr.astype(np.float64)
    if x.ndim == 2:
        means = [float(x.mean())] * 3
        n_ch = 1.0
    else:
        means = [float(x[..., c].mean()) for c in range(3)]
        n_ch = float(x.shape[2])
    return [
        float(arr.shape[0]),
        float(arr.shape[1]),
        n_ch,
        *means,
        float(x.mean()),
        float(x.std()),
    ]


# ---------------------------------------------------------------------------
# Raw RGB video: concatenated width*height*3 uint8 frames
# ---------------------------------------------------------------------------


def decode_raw_frame(payload: bytes, width: int, height: int, frame_idx: int) -> np.ndarray:
    """Slice one (height, width, 3) frame out of a concatenated raw-RGB
    payload — zero-copy via frombuffer on the frame's byte range."""
    fsz = width * height * 3
    start = frame_idx * fsz
    if start + fsz > len(payload):
        raise ValueError(f"frame {frame_idx} out of range for payload of {len(payload)} bytes")
    return np.frombuffer(payload[start : start + fsz], dtype=np.uint8).reshape(height, width, 3)


def video_features(payload: bytes, width: int, height: int, n_frames: int) -> list[float]:
    """8-dim video features from ALL frames at once (one reshape, no loop):
    [n_frames, height, width, mean, std, first-frame mean, last-frame mean,
    mean |frame-to-frame delta|]."""
    fsz = width * height * 3
    frames = np.frombuffer(payload[: fsz * n_frames], dtype=np.uint8).reshape(
        n_frames, height, width, 3
    )
    per_frame = frames.reshape(n_frames, -1).mean(axis=1)
    delta = float(np.abs(np.diff(per_frame)).mean()) if n_frames > 1 else 0.0
    return [
        float(n_frames),
        float(height),
        float(width),
        float(frames.mean()),
        float(frames.std()),
        float(per_frame[0]),
        float(per_frame[-1]),
        delta,
    ]


# Mimes the pure-python layer can decode; everything else needs a codec lib.
DECODABLE_MIMES = {
    "audio/wav": "wav",
    "audio/x-wav": "wav",
    "image/x-portable-pixmap": "pnm",
    "image/x-portable-graymap": "pnm",
    "video/x-raw-rgb": "rawvideo",
}


# ---------------------------------------------------------------------------
# Optional-dependency codecs — the documented plugin point, feature-gated
# behind import-try so the pure-python formats stay the always-on path.
# When Pillow / soundfile are installed, compressed mimes flip to
# decoded=true through the SAME (bytes) -> array interface; when absent
# (this container), resolvers return None and callers use the stub.
# ---------------------------------------------------------------------------

OPTIONAL_IMAGE_MIMES = {
    "image/jpeg", "image/png", "image/gif", "image/webp", "image/bmp",
}
OPTIONAL_AUDIO_MIMES = {"audio/mpeg", "audio/mp3", "audio/flac", "audio/ogg"}


def pillow_image_decoder():
    """bytes -> uint8 (h, w, 3) decoder backed by Pillow, or None when the
    optional dependency is absent."""
    try:
        from PIL import Image  # optional dependency
    except Exception:
        return None
    import io

    def decode(payload: bytes) -> np.ndarray:
        with Image.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"))

    return decode


def pillow_image_resizer():
    """(bytes, w, h) -> re-encoded bytes resizer backed by Pillow (keeps the
    source format), or None when absent."""
    try:
        from PIL import Image  # optional dependency
    except Exception:
        return None
    import io

    def resize(payload: bytes, w: int, h: int) -> bytes:
        with Image.open(io.BytesIO(payload)) as im:
            fmt = im.format or "PNG"
            buf = io.BytesIO()
            im.resize((w, h)).save(buf, format=fmt)
            return buf.getvalue()

    return resize


def soundfile_audio_decoder():
    """bytes -> (float64 (n, ch) in [-1, 1], sample_rate) decoder backed by
    soundfile/libsndfile, or None when absent."""
    try:
        import soundfile  # optional dependency
    except Exception:
        return None
    import io

    def decode(payload: bytes):
        data, rate = soundfile.read(io.BytesIO(payload), always_2d=True)
        return np.asarray(data, dtype=np.float64), int(rate)

    return decode


def optional_decoders() -> dict:
    """Resolve every optional decoder once (called per executor worker)."""
    return {
        "image": pillow_image_decoder(),
        "image_resize": pillow_image_resizer(),
        "audio": soundfile_audio_decoder(),
    }
