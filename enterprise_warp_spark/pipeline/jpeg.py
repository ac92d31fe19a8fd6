"""Pure-numpy baseline JPEG codec (ITU-T T.81 sequential DCT, 8-bit).

Closes the last stub in the compressed-media path: with this module,
`image/jpeg` payloads decode FOR REAL in a container with no Pillow —
the same guarantee `decode_png` gives for PNG. The implementation follows
only the public JPEG specification (ITU-T T.81 / ISO 10918-1):

decoder (`decode_jpeg`)
  marker parse (SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS) -> canonical Huffman
  tables built FROM THE FILE's DHT segments -> MCU entropy decode (DC
  differentials, AC run/size with ZRL+EOB, restart markers) -> dequantize
  -> inverse zigzag -> orthonormal 8x8 IDCT (one numpy matmul pair per
  block stack) -> component upsampling for 4:2:0/4:2:2 -> YCbCr->RGB.
  Baseline sequential only: progressive (SOF2) raises NotImplementedError,
  which the multimodal layer treats as "fall through to the optional
  Pillow plugin, else stub" — never a crash.

encoder (`encode_jpeg`)
  4:4:4 (or grayscale) baseline JFIF with the spec Annex-K quantization
  tables (quality-scaled, IJG convention) and Annex-K Huffman tables,
  written into DQT/DHT so ANY decoder — including this one — reads the
  exact tables used. Exists to make the round-trip testable hermetically.

Spark never calls this per row from Python UDFs in a relational path —
it runs inside the Arrow-batched mapInPandas media kernels
(`pipeline/multimodal.py`), same as the other codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1 example quantization tables
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix: row k, col n
_T = np.cos((2 * np.arange(8)[None, :] + 1) * np.arange(8)[:, None] * np.pi / 16.0)
_T *= np.sqrt(2.0 / 8.0)
_T[0, :] *= 1.0 / np.sqrt(2.0)


def _dct2(blocks: np.ndarray) -> np.ndarray:
    """Stacked 2-D DCT-II over (..., 8, 8)."""
    return _T @ blocks @ _T.T


def _idct2(blocks: np.ndarray) -> np.ndarray:
    return _T.T @ blocks @ _T


# ---------------------------------------------------------------------------
# canonical Huffman tables
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, canonical order per the spec."""
    if sum(bits) != len(values):
        raise ValueError("DHT: counts do not match value list")
    table: dict[tuple[int, int], int] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, code_length)."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_decode_table(bits, values).items()
    }


# ---------------------------------------------------------------------------
# bit IO
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Reads the entropy-coded segment with 0xFF00 unstuffing; stops at any
    real marker (leaves it for the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerReached(self.pos)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0


class _MarkerReached(Exception):
    def __init__(self, pos: int) -> None:
        self.pos = pos


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential JPEG -> uint8 (h, w) gray or (h, w, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                off += 1
                if pq == 0:
                    qts[tq] = np.frombuffer(seg[off : off + 64], np.uint8).astype(np.int32)
                    off += 64
                else:
                    qts[tq] = np.frombuffer(
                        seg[off : off + 128], ">u2"
                    ).astype(np.int32)
                    off += 128
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(bits, vals)
                off += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline/ext sequential
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG (CMYK/YCCK) needs an external codec"
                )
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xFF{marker:02X} (progressive/lossless)"
            )
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                sel[cs] = (tdta >> 4, tdta & 0x0F)
            data_start = pos + seglen
            return _decode_scan(
                payload, data_start, frame, sel, qts, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, sel, qts, huff_dc, huff_ac, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # per-component coefficient block grids
    planes = []
    for c in comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        planes.append(np.zeros((bh, bw, 64), dtype=np.int32))

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    n_mcus = mcus_x * mcus_y
    mcu = 0
    while mcu < n_mcus:
        if restart_interval and mcu and mcu % restart_interval == 0:
            # expect RSTn marker; realign
            reader.align()
            p = reader.pos
            if data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7:
                reader.pos = p + 2
                pred = [0] * len(comps)
        my, mx = divmod(mcu, mcus_x)
        try:
            for ci, c in enumerate(comps):
                tdc, tac = sel[c["id"]]
                dct, act = huff_dc[tdc], huff_ac[tac]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        s = _decode_huff(reader, dct)
                        diff = _extend(reader.receive(s), s)
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[k] = _extend(reader.receive(s), s)
                            k += 1
                        planes[ci][my * c["v"] + by, mx * c["h"] + bx] = coef
        except _MarkerReached:
            break  # truncated stream: keep what we have (robust decode)
        mcu += 1

    # dequantize + inverse zigzag + IDCT, stacked per component
    out_planes = []
    for c, plane in zip(comps, planes):
        # plane holds zigzag-order coefficients; dequantize with the
        # zigzag-order DQT steps, scattering both into natural order
        nat = np.zeros_like(plane)
        nat[..., ZIGZAG] = plane * qts[c["tq"]][None, None, :]
        bh, bw = plane.shape[:2]
        blocks = nat.reshape(bh, bw, 8, 8).astype(np.float64)
        pix = _idct2(blocks) + 128.0
        # tile blocks back into a (bh*8, bw*8) plane
        full = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full resolution (nearest, per sampling factors)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            full = np.repeat(np.repeat(full, ry, axis=0), rx, axis=1)
        out_planes.append(full[:h, :w])

    if len(comps) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (baseline 4:4:4 / grayscale JFIF)
# ---------------------------------------------------------------------------


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (qt * scale + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


def _encode_blocks(writer, blocks_zz, qt_zz, dc_tab, ac_tab, pred):
    """Entropy-encode a (n, 64) stack of zigzag-quantized blocks."""
    for blk in blocks_zz:
        dc = int(blk[0])
        diff = dc - pred
        pred = dc
        s = _csize(diff)
        code, ln = dc_tab[s]
        writer.write(code, ln)
        if s:
            bits = diff if diff >= 0 else diff + (1 << s) - 1
            writer.write(bits, s)
        # AC
        run = 0
        last_nz = 0
        nz = np.nonzero(blk[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tab[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            s = _csize(v)
            code, ln = ac_tab[(run << 4) | s]
            writer.write(code, ln)
            bits = v if v >= 0 else v + (1 << s) - 1
            writer.write(bits, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_tab[0x00]  # EOB
            writer.write(code, ln)
    return pred


def _plane_to_zz(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(H, W) float plane -> (n_blocks, 64) zigzag quantized ints, blocks in
    raster order, edge-padded to multiples of 8 by replication."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    coefs = _dct2(blocks.astype(np.float64) - 128.0)
    qnat = np.zeros(64, dtype=np.float64)
    qnat[ZIGZAG] = qt  # qt is zigzag-order; map to natural for division
    q = np.round(coefs / qnat.reshape(8, 8)).astype(np.int32)
    zz = q.reshape(-1, 64)[:, ZIGZAG]
    return zz


def encode_jpeg(arr: np.ndarray, quality: int = 90, subsample: bool = False) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> baseline JFIF bytes.

    subsample=False writes 4:4:4 (every component full resolution);
    subsample=True writes 4:2:0 (Y sampling 2x2, box-averaged half-res
    chroma) — the layout real camera/exporter JPEGs use, kept here so the
    decoder's MCU-interleave + upsampling path has a hermetic test."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if gray:
        subsample = False
    h, w = arr.shape[:2]
    # DQT is zigzag-serialized per the spec, and _plane_to_zz expects the
    # same zigzag order — serialize the natural-order Annex-K tables ONCE
    qt_l = _quality_scale(QT_LUM, quality)[ZIGZAG]
    qt_c = _quality_scale(QT_CHROM, quality)[ZIGZAG]

    if gray:
        planes = [arr.astype(np.float64)]
    else:
        r, g, b = (arr[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # box-average 2x2 -> half-resolution chroma (pad odd dims first)
            def _half(p):
                ph, pw = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                q = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
                return q.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

            cb, cr = _half(cb), _half(cr)
        planes = [y, cb, cr]

    y_hv = 0x22 if subsample else 0x11
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    # DQT
    out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x00]) + bytes(qt_l.tolist())
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([0x01]) + bytes(qt_c.tolist())
    # SOF0
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, y_hv if ci == 0 else 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    tables = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if not gray:
        tables += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    for tclass, (bits, vals) in tables:
        body = bytes([tclass]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    # SOS
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _build_encode_table(*DC_LUM)
    ac_l = _build_encode_table(*AC_LUM)
    dc_c = _build_encode_table(*DC_CHROM)
    ac_c = _build_encode_table(*AC_CHROM)

    writer = _BitWriter()
    preds = [0] * nc
    if not subsample:
        zzs = [
            _plane_to_zz(p, qt_l if i == 0 else qt_c)
            for i, p in enumerate(planes)
        ]
        # 4:4:4, all sampling factors 1: MCU = one block per component
        for bi in range(zzs[0].shape[0]):
            for ci in range(nc):
                preds[ci] = _encode_blocks(
                    writer,
                    zzs[ci][bi : bi + 1],
                    None,
                    dc_l if ci == 0 else dc_c,
                    ac_l if ci == 0 else ac_c,
                    preds[ci],
                )
    else:
        # 4:2:0: pad Y to 16-multiples so the MCU grid covers the chroma
        # grid exactly, then MCU = 4 raster Y blocks + 1 Cb + 1 Cr
        yh, yw = -(-h // 16) * 16, -(-w // 16) * 16
        ypad = np.pad(
            planes[0], ((0, yh - h), (0, yw - w)), mode="edge"
        )
        zz_y = _plane_to_zz(ypad, qt_l)
        zz_cb = _plane_to_zz(planes[1], qt_c)
        zz_cr = _plane_to_zz(planes[2], qt_c)
        mcus_x, mcus_y = yw // 16, yh // 16
        yblocks_x = yw // 8
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(2):
                    for bx in range(2):
                        bi = (2 * my + by) * yblocks_x + (2 * mx + bx)
                        preds[0] = _encode_blocks(
                            writer, zz_y[bi : bi + 1], None, dc_l, ac_l, preds[0]
                        )
                ci = my * mcus_x + mx
                preds[1] = _encode_blocks(
                    writer, zz_cb[ci : ci + 1], None, dc_c, ac_c, preds[1]
                )
                preds[2] = _encode_blocks(
                    writer, zz_cr[ci : ci + 1], None, dc_c, ac_c, preds[2]
                )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
