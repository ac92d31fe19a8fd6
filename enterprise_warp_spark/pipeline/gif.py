"""Pure-python GIF codec (GIF87a/89a, public format spec).

Flips `image/gif` to always-really-decoded alongside PNG/JPEG. Follows
only the public GIF specification (CompuServe GIF89a):

decoder (`decode_gif`)
  header + logical screen descriptor -> global/local color tables ->
  extension blocks (graphic control: transparency index honored,
  composited over the background; others skipped) -> per-image LZW
  decompression (variable code width, clear/EOI codes, sub-block
  de-chunking) -> optional interlace de-pass -> RGB frame(s).
  `decode_gif` returns the FIRST frame as (h, w, 3) uint8 (what feature
  extraction wants); `decode_gif_frames` yields every frame for animated
  GIFs (each composited onto the previous canvas per disposal none/keep).

encoder (`encode_gif`)
  single-frame GIF89a with a palette built from the image's distinct
  colors (<= 256 required — the format is palettized; encoding is
  lossless exactly when the image fits a 256-color palette) and a
  standard LZW compressor. Exists for hermetic round-trip tests.

Like the other codecs this runs inside Arrow-batched mapInPandas kernels
(pipeline/multimodal.py), never per-row in a relational path.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> list[int]:
    """GIF-flavor LZW: variable width codes starting at min_code_size+1,
    clear code resets the table, stops at EOI or when `expected` pixels
    are produced."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []

    # bit reader, LSB-first within bytes (GIF convention)
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return eoi  # truncated stream: treat as end
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    def reset_table():
        return {i: [i] for i in range(clear)}

    table = reset_table()
    width = min_code_size + 1
    prev: list[int] | None = None
    next_code = eoi + 1
    while len(out) < expected:
        code = read_code(width)
        if code == clear:
            table = reset_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError("corrupt LZW stream")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:expected]


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run: tuple[int, ...] = ()
    for px in indices:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # the encoder assigns each entry one emit AHEAD of the decoder
        # (encoder: at emit k; decoder: at read k+1), so it must bump the
        # width one entry later: when the just-assigned code == 2^width
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == (1 << 12):
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = (px,)
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif_frames(
    payload: bytes, max_frames: int | None = None
) -> list[np.ndarray]:
    """Frames of a GIF as (h, w, 3) uint8 canvases, composited per the
    graphic-control disposal method: 0/1 keep the canvas, 2 restores the
    frame rect to transparent — rendered BLACK on this alpha-less RGB
    canvas, the mainstream-decoder convention (browsers ignore the header
    background color there; ADVICE r5) — and 3 restores the pre-frame
    canvas.
    Transparent pixels keep the underlying canvas value. `max_frames`
    stops decoding early (decode_gif passes 1 — feature extraction never
    pays for the tail of an animation). Frame rects extending past the
    logical screen (buggy real-world encoders) are clamped like mainstream
    decoders do."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg_idx, _ = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n

    if gct is not None and bg_idx < len(gct):
        background = gct[bg_idx].astype(np.uint8)
    else:
        background = np.zeros(3, np.uint8)
    canvas = np.tile(background, (h, w, 1)).astype(np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = payload[pos]
                gflags = payload[pos + 1]
                transparent = payload[pos + 4] if gflags & 0x01 else None
                disposal = (gflags >> 2) & 0x07
                pos += 1 + size
            # skip remaining sub-blocks (any extension)
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:  # image descriptor expected
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        else:
            ct = gct
        if ct is None:
            raise ValueError("GIF image with no color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = np.array(
            _lzw_decode(b"".join(chunks), min_code, iw * ih), np.int32
        ).reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        # clamp the frame rect to the logical screen
        cw, ch = min(iw, max(0, w - ix)), min(ih, max(0, h - iy))
        idx = idx[:ch, :cw]
        before = canvas.copy() if disposal == 3 else None
        region = canvas[iy : iy + ch, ix : ix + cw].copy()
        vis = (
            np.ones((ch, cw), bool)
            if transparent is None
            else idx != transparent
        )
        region[vis] = ct[np.clip(idx[vis], 0, len(ct) - 1)]
        canvas[iy : iy + ch, ix : ix + cw] = region
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        # apply the frame's disposal for the NEXT frame's starting canvas
        if disposal == 2:  # restore rect to transparent (black), like
            # mainstream decoders — NOT the header background color
            canvas[iy : iy + ch, ix : ix + cw] = 0
        elif disposal == 3 and before is not None:  # restore previous
            canvas = before
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF payload has no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame as (h, w, 3) uint8 — the feature-extraction entry.
    Stops after one frame: an animated GIF never pays full-animation LZW
    cost in the Spark kernels."""
    return decode_gif_frames(payload, max_frames=1)[0]


# ---------------------------------------------------------------------------
# encoder (single frame, palettized; lossless for <=256 distinct colors)
# ---------------------------------------------------------------------------


def encode_gif(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[-1] != 3:
        # reshape(-1, 3) on RGBA/(h,w,1) input would regroup bytes ACROSS
        # pixels and encode garbage — reject loudly instead
        raise ValueError(
            f"encode_gif needs (h, w) gray or (h, w, 3) RGB, got {arr.shape}"
        )
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF is palettized: {len(colors)} distinct colors > 256 "
            "(quantize first)"
        )
    # palette size = power of two >= max(2, n_colors)
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_pal = 1 << bits
    palette = np.zeros((n_pal, 3), np.uint8)
    palette[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07) | 0x70, 0, 0)
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_encode([int(i) for i in inverse], min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
