"""AIFF / AIFF-C and Sun AU audio containers — pure-module decoders and
encoders for the two classic big-endian audio formats a web-scale corpus
still carries (AIFF: EA IFF-85 "Audio Interchange File Format", Apple 1989
spec; AU: the Sun/NeXT ".snd" header, as documented in the public sndhdr
lore and CPython's `sunau` module docs).

No reference-repo counterpart: this extends the multimodal codec matrix
(pipeline/codecs.py decode_audio) with two formats whose CANONICAL
implementations ship inside this container — CPython's `aifc` and `sunau`
modules plus the CPython test-suite fixture files (Lib/test/audiodata's
pluck-* family, including real ulaw/alaw AIFF-C) — so the interop pins are
live canonical-codec tests, the strongest evidence class
(tests/test_aiff_au_interop.py).

Output convention matches decode_wav: float64 (n_frames, n_channels)
scaled to [-1, 1] by the stream's bits-per-sample full scale, so the same
signal in WAV/AIFF/AU yields identical features and fingerprints.
"""

from __future__ import annotations

import struct

import numpy as np

from enterprise_warp_spark.pipeline.codecs import _alaw_table, _ulaw_table

_BE_PCM = {16: np.dtype(">i2"), 32: np.dtype(">i4")}


def _read_float80(b: bytes) -> float:
    """IEEE 754 80-bit extended float (the COMM sample-rate field):
    1 sign + 15 exponent + 64 mantissa with explicit integer bit."""
    if len(b) != 10:
        raise ValueError("extended float needs 10 bytes")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _write_float80(x: float) -> bytes:
    if x == 0:
        return b"\x00" * 10
    sign = 0x8000 if x < 0 else 0
    x = abs(x)
    exp = 16383 + 63
    mant = int(x)
    frac = x - mant
    # normalize so the explicit integer bit (bit 63) is set
    while mant < (1 << 63):
        mant <<= 1
        frac *= 2.0
        mant += int(frac)
        frac -= int(frac)
        exp -= 1
    while mant >= (1 << 64):
        mant >>= 1
        exp += 1
    return struct.pack(">H", sign | exp) + struct.pack(">Q", mant)


def _pcm_to_float(raw: bytes, bits: int, signed_8: bool = True) -> np.ndarray:
    """Big-endian signed PCM bytes -> float64 in [-1, 1]."""
    if bits == 8:
        x = np.frombuffer(raw, dtype=np.int8).astype(np.float64)
        if not signed_8:  # never used by AIFF/AU (both are signed), kept
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        return x / 128.0
    if bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int64)
        v = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return v.astype(np.float64) / float(1 << 23)
    if bits in _BE_PCM:
        x = np.frombuffer(raw, dtype=_BE_PCM[bits]).astype(np.float64)
        return x / float(2 ** (bits - 1))
    raise NotImplementedError(f"big-endian PCM bits={bits}")


def decode_aiff(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode an AIFF or AIFF-C payload -> (float64 (n, ch) in [-1, 1],
    sample_rate). Supports PCM 8/16/24/32 (big-endian signed; AIFC 'NONE')
    and the AIFC G.711 compressions 'ulaw'/'ULAW'/'alaw'/'ALAW' via the
    module's exact companding tables (bit-identical to CPython audioop,
    pinned in tests). Walks the IFF chunk list; chunks are word-aligned."""
    if len(payload) < 12 or payload[:4] != b"FORM":
        raise ValueError("not an IFF FORM payload")
    form = payload[8:12]
    if form not in (b"AIFF", b"AIFC"):
        raise ValueError(f"FORM type {form!r} is not AIFF/AIFC")
    comm = None
    comp = b"NONE"
    pos = 12
    ssnd = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from(">I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            n_ch, n_frames, bits = struct.unpack_from(">hIh", body, 0)
            rate = _read_float80(body[8:18])
            if form == b"AIFC" and size >= 22:
                comp = body[18:22]
            comm = (n_ch, n_frames, bits, int(round(rate)))
        elif cid == b"SSND":
            offset, _blocksize = struct.unpack_from(">II", body, 0)
            ssnd = body[8 + offset :]
        pos += 8 + size + (size & 1)
    if comm is None or ssnd is None:
        raise ValueError("AIFF payload missing COMM or SSND chunk")
    n_ch, n_frames, bits, rate = comm
    if comp in (b"NONE", b"sowt"):
        if comp == b"sowt":  # little-endian PCM variant (QuickTime)
            if bits not in (8, 16, 32):
                raise NotImplementedError("sowt bits=%d" % bits)
            dt = {8: np.int8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
            x = np.frombuffer(ssnd, dtype=dt).astype(np.float64) / float(
                2 ** (bits - 1)
            )
        else:
            x = _pcm_to_float(ssnd, bits)
    elif comp.lower() == b"ulaw":
        x = _ulaw_table()[np.frombuffer(ssnd, dtype=np.uint8)]
    elif comp.lower() == b"alaw":
        x = _alaw_table()[np.frombuffer(ssnd, dtype=np.uint8)]
    else:
        raise NotImplementedError(f"AIFC compression {comp!r}")
    n = min((len(x) // n_ch) * n_ch, n_frames * n_ch)
    return x[:n].reshape(-1, n_ch), rate


def encode_aiff(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Float [-1, 1] (n,) or (n, ch) -> AIFF PCM big-endian payload."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_frames, n_ch = x.shape
    full = float(2 ** (bits - 1))
    q = np.clip(np.round(x * full), -full, full - 1).astype(np.int64)
    if bits == 8:
        data = q.astype(np.int8).tobytes()
    elif bits in _BE_PCM:
        data = q.astype(_BE_PCM[bits]).tobytes()
    elif bits == 24:
        v = q & 0xFFFFFF
        b = np.empty((v.size, 3), dtype=np.uint8)
        flat = v.reshape(-1)
        b[:, 0], b[:, 1], b[:, 2] = flat >> 16, (flat >> 8) & 0xFF, flat & 0xFF
        data = b.tobytes()
    else:
        raise NotImplementedError(f"encode_aiff bits={bits}")
    comm = (
        struct.pack(">hIh", n_ch, n_frames, bits)
        + _write_float80(float(sample_rate))
    )
    ssnd = struct.pack(">II", 0, 0) + data
    chunks = b""
    for cid, body in ((b"COMM", comm), (b"SSND", ssnd)):
        chunks += cid + struct.pack(">I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


# Sun AU encodings (the .snd header's encoding field)
_AU_ULAW, _AU_PCM8, _AU_PCM16, _AU_PCM24, _AU_PCM32 = 1, 2, 3, 4, 5
_AU_F32, _AU_F64, _AU_ALAW = 6, 7, 27


def decode_au(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a Sun/NeXT AU payload -> (float64 (n, ch) in [-1, 1], rate).
    Encodings: G.711 mu-law (1) / A-law (27), signed big-endian PCM
    8/16/24/32 (2-5), IEEE float 32/64 (6-7). data_size 0xffffffff means
    'to end of file' per the spec."""
    if len(payload) < 24 or payload[:4] != b".snd":
        raise ValueError("not a Sun AU payload")
    offset, size, enc, rate, n_ch = struct.unpack_from(">IIIII", payload, 4)
    if offset < 24:
        raise ValueError("AU data offset overlaps header")
    if n_ch < 1 or rate < 1:
        # hostile header: keep the decoder's ValueError contract instead
        # of a ZeroDivisionError from the frame-count division below
        raise ValueError(f"AU header invalid: channels={n_ch} rate={rate}")
    end = len(payload) if size == 0xFFFFFFFF else min(len(payload), offset + size)
    raw = payload[offset:end]
    if enc == _AU_ULAW:
        x = _ulaw_table()[np.frombuffer(raw, dtype=np.uint8)]
    elif enc == _AU_ALAW:
        x = _alaw_table()[np.frombuffer(raw, dtype=np.uint8)]
    elif enc in (_AU_PCM8, _AU_PCM16, _AU_PCM24, _AU_PCM32):
        x = _pcm_to_float(raw, {2: 8, 3: 16, 4: 24, 5: 32}[enc])
    elif enc in (_AU_F32, _AU_F64):
        dt = np.dtype(">f4") if enc == _AU_F32 else np.dtype(">f8")
        x = np.frombuffer(raw, dtype=dt).astype(np.float64)
    else:
        raise NotImplementedError(f"AU encoding {enc}")
    n = (len(x) // n_ch) * n_ch
    return x[:n].reshape(-1, n_ch), rate


def encode_au(
    samples: np.ndarray, sample_rate: int, encoding: int = _AU_PCM16
) -> bytes:
    """Float [-1, 1] -> Sun AU payload (PCM 8/16/32 or G.711 via the
    module's exact companders)."""
    from enterprise_warp_spark.pipeline.codecs import encode_g711

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    flat = x.reshape(-1)
    if encoding == _AU_ULAW:
        data = encode_g711(flat, "ulaw")
    elif encoding == _AU_ALAW:
        data = encode_g711(flat, "alaw")
    elif encoding in (_AU_PCM8, _AU_PCM16, _AU_PCM32):
        bits = {2: 8, 3: 16, 5: 32}[encoding]
        full = float(2 ** (bits - 1))
        q = np.clip(np.round(flat * full), -full, full - 1).astype(np.int64)
        dt = {8: np.dtype(np.int8), 16: _BE_PCM[16], 32: _BE_PCM[32]}[bits]
        data = q.astype(dt).tobytes()
    else:
        raise NotImplementedError(f"encode_au encoding {encoding}")
    hdr = b".snd" + struct.pack(
        ">IIIII", 24, len(data), encoding, int(sample_rate), n_ch
    )
    return hdr + data
