"""Baseline TIFF decoder — pure python from the public TIFF 6.0 spec.

Covers the shapes document/scan corpora actually contain: both byte
orders (II/MM), stripped images, 8-bit grayscale and RGB(A),
PhotometricInterpretation 0/1/2, and the three baseline compressions —
none (1), LZW (5, the TIFF variant: MSB-first codes, 9-bit start, Clear
256 / EOI 257, early code-width change) and PackBits (32773) — plus the
horizontal-differencing predictor (tag 317). Tiled, planar, palette and
sub-byte variants raise NotImplementedError loudly.

Execution shape: one pass per payload inside the Arrow-batched media
kernels (pipeline/multimodal.py), like every other codec. An in-module
minimal encoder provides hermetic fixtures (the FLAC/Vorbis pattern).

Reference surface: none — the reference engine has no media pipeline;
this extends the training-data side (SURVEY §2.8 multimodal).
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 §8)
_WIDTH, _LENGTH, _BITS, _COMPRESSION = 256, 257, 258, 259
_PHOTOMETRIC, _STRIP_OFFSETS, _SPP = 262, 273, 277
_ROWS_PER_STRIP, _STRIP_COUNTS, _PLANAR, _PREDICTOR = 278, 279, 284, 317
_TILE_WIDTH = 322

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_ifd(payload: bytes, end: str):
    off = struct.unpack_from(end + "I", payload, 4)[0]
    n = struct.unpack_from(end + "H", payload, off)[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, ttype, count = struct.unpack_from(end + "HHI", payload, base)
        size = _TYPE_SIZE.get(ttype)
        if size is None:
            continue  # unknown field type: spec says skip
        total = size * count
        if total <= 4:
            data_off = base + 8
        else:
            data_off = struct.unpack_from(end + "I", payload, base + 8)[0]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I", 5: "Q"}[ttype]
        if ttype == 5:  # RATIONAL: store numerator only (unused here)
            vals = [
                struct.unpack_from(end + "I", payload, data_off + 8 * k)[0]
                for k in range(count)
            ]
        else:
            vals = list(
                struct.unpack_from(end + str(count) + fmt, payload, data_off)
            )
        tags[tag] = vals
    return tags


def _unpackbits(data: bytes, expect: int) -> bytes:
    """PackBits (TIFF 6.0 §9): n >= 0 -> copy n+1 literal bytes;
    -127 <= n <= -1 -> repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out)


def _lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW (§13): MSB-first bit packing, 9-bit initial code
    width, ClearCode 256, EOI 257, and the 'early change' convention (the
    code width grows one code EARLIER than the table size alone implies)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while len(out) < expect:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated strip: keep what decoded
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        bitbuf &= (1 << nbits) - 1  # drop consumed high bits (else the
        # accumulator grows without bound and every shift goes O(stream))
        if code == CLEAR:
            reset()
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream (code beyond table)")
        out += entry
        prev = entry
        # early change: width bumps when the NEXT added code would not fit
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a baseline TIFF payload to uint8 (h, w) gray or (h, w, 3).
    Multi-page files decode their FIRST IFD (the convention of every
    image library's default page)."""
    if payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    end = "<" if payload[:2] == b"II" else ">"
    if struct.unpack_from(end + "H", payload, 2)[0] != 42:
        raise ValueError("bad TIFF magic")
    tags = _read_ifd(payload, end)
    if _TILE_WIDTH in tags:
        raise NotImplementedError("tiled TIFF needs an external codec")
    w = tags[_WIDTH][0]
    h = tags[_LENGTH][0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} not supported")
    comp = tags.get(_COMPRESSION, [1])[0]
    photo = tags.get(_PHOTOMETRIC, [1])[0]
    planar = tags.get(_PLANAR, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    if planar != 1:
        raise NotImplementedError("planar TIFF not supported")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"TIFF photometric {photo} not supported")
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported")
    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_COUNTS]
    rows_per = tags.get(_ROWS_PER_STRIP, [h])[0] or h
    row_bytes = w * spp
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip_rows = min(rows_per, h - si * rows_per)
        expect = strip_rows * row_bytes
        chunk = payload[so : so + sc]
        if comp == 1:
            raw += chunk[:expect]
        elif comp == 5:
            raw += _lzw_decode(chunk, expect)
        elif comp == 32773:
            raw += _unpackbits(chunk, expect)
        else:
            raise NotImplementedError(
                f"TIFF compression {comp} needs an external codec"
            )
    if len(raw) < h * row_bytes:
        raise ValueError("truncated TIFF strip data")
    img = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8).reshape(
        h, w, spp
    )
    if predictor == 2:  # horizontal differencing: undo with a cumsum
        img = (np.cumsum(img.astype(np.int64), axis=1) % 256).astype(np.uint8)
    if photo == 0:  # WhiteIsZero: invert
        img = (255 - img.astype(np.int64)).astype(np.uint8)
    if spp == 1:
        return img[:, :, 0]
    return img[:, :, :3]  # RGB / RGBA -> RGB (alpha dropped)


# ---------------------------------------------------------------------------
# minimal encoder (fixtures)
# ---------------------------------------------------------------------------


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (test-side twin of _lzw_decode)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code, width):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
            bitbuf &= (1 << nbits) - 1  # same unbounded-accumulator guard

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = next_code
        next_code += 1
        # early change mirror: the decoder widens when table size + 1
        # reaches the width limit
        if next_code + 1 > (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    arr: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Encode uint8 (h, w) gray or (h, w, 3) RGB as baseline TIFF
    (compression 1=none or 5=LZW; optional horizontal predictor)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a3 = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        a3 = a
    else:
        raise ValueError("encode_tiff takes (h, w) gray or (h, w, 3) RGB")
    h, w, spp = a3.shape
    end = ">" if big_endian else "<"
    rows_per = rows_per_strip or h
    body = a3
    if predictor == 2:
        d = body.astype(np.int64)
        body = np.concatenate(
            [d[:, :1], (d[:, 1:] - d[:, :-1]) % 256], axis=1
        ).astype(np.uint8)
    strips = []
    for y0 in range(0, h, rows_per):
        raw = body[y0 : y0 + rows_per].tobytes()
        strips.append(_lzw_encode(raw) if compression == 5 else raw)

    entries = []  # (tag, type, count, value_or_bytes)
    photo = 1 if spp == 1 else 2

    def short(tag, v):
        # inline values are LEFT-justified in the 4-byte field, so a
        # big-endian SHORT must occupy the first two bytes (v << 16)
        entries.append((tag, 3, 1, v if end == "<" else v << 16))

    header = 8
    # lay out: header | IFD | tag overflow | strip data
    n_tags = 10
    ifd_size = 2 + 12 * n_tags + 4
    overflow = bytearray()
    overflow_base = header + ifd_size

    def longs(tag, vals):
        if len(vals) == 1:
            entries.append((tag, 4, 1, vals[0]))
        else:
            off = overflow_base + len(overflow)
            for v in vals:
                overflow.extend(struct.pack(end + "I", v))
            entries.append((tag, 4, len(vals), off))

    def shorts(tag, vals):
        if len(vals) <= 2:
            packed = 0
            for i, v in enumerate(vals):
                packed |= v << (16 * i) if end == "<" else v << (
                    16 * (1 - i)
                )
            entries.append((tag, 3, len(vals), packed))
        else:
            off = overflow_base + len(overflow)
            for v in vals:
                overflow.extend(struct.pack(end + "H", v))
            entries.append((tag, 3, len(vals), off))

    short(_WIDTH, w)
    short(_LENGTH, h)
    shorts(_BITS, [8] * spp)
    short(_COMPRESSION, compression)
    short(_PHOTOMETRIC, photo)
    short(_SPP, spp)
    short(_ROWS_PER_STRIP, rows_per)
    short(_PREDICTOR, predictor)
    # strip tables go last (need the overflow laid out first); reserve
    # their overflow now
    data_base = overflow_base + len(overflow) + 8 * len(strips) * (
        1 if len(strips) > 1 else 0
    )
    offs = []
    pos = data_base
    for sdat in strips:
        offs.append(pos)
        pos += len(sdat)
    longs(_STRIP_OFFSETS, offs)
    longs(_STRIP_COUNTS, [len(sd) for sd in strips])
    entries.sort(key=lambda e: e[0])

    out = bytearray()
    out += (b"II" if end == "<" else b"MM") + struct.pack(end + "H", 42)
    out += struct.pack(end + "I", 8)
    out += struct.pack(end + "H", len(entries))
    for tag, ttype, count, val in entries:
        out += struct.pack(end + "HHI", tag, ttype, count)
        # `val` is always a pre-packed 4-byte LONG here: inline SHORT
        # left-justification already happened in short()/shorts()
        out += struct.pack(end + "I", val)
    out += struct.pack(end + "I", 0)  # next IFD
    out += overflow
    for sdat in strips:
        out += sdat
    return bytes(out)
