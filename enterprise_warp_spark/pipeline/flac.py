"""Pure-python FLAC codec (lossless audio; public format spec).

Flips `audio/flac` from plugin-gated to ALWAYS-really-decoded, the same
guarantee pipeline/jpeg.py gives image/jpeg. Follows only the public FLAC
format specification (xiph.org / RFC 9639):

decoder (`decode_flac`)
  fLaC magic -> STREAMINFO + metadata skip -> per-frame: header parse
  (blocksize/rate/channel-assignment/sample-size codes, UTF-8 frame
  number, CRC-8 skip) -> subframes (CONSTANT, VERBATIM, FIXED orders 0-4,
  LPC any order; wasted-bits) -> rice-coded residual partitions (4- and
  5-bit parameters, raw escape) -> fixed/LPC reconstruction ->
  left-side / right-side / mid-side stereo decorrelation -> int16/int8
  numpy samples. Lossless: output equals the encoder's input exactly.

encoder (`encode_flac`)
  STREAMINFO + frames with independent channels and per-subframe choice of
  CONSTANT / FIXED order 0-2 / VERBATIM by residual cost, rice parameter
  fit per subframe (partition order 0), CRC-8/CRC-16 per spec. Exists so
  round-trips are hermetic; any spec-compliant decoder reads its output.

Like the other codecs this never runs per-row in a relational path — it is
called inside the Arrow-batched media kernels (pipeline/multimodal.py).
Decoding is bit-serial Python and sized for media *features* (metadata,
fingerprints, short clips), not bulk transcoding — the documented plugin
point (soundfile) remains the fast path when installed.

Oracle boundary (r11 audit): decode correctness rests on hermetic twins +
spec structure checks (CRC-8/16 polynomials, UTF-8 frame numbers,
STREAMINFO MD5) because this container has NO canonical counterpart: no
libFLAC/libogg in ldconfig, no flac/ffmpeg/sox binaries, no *.flac file
anywhere on the filesystem, no JVM sound SPI for FLAC, and no network to
fetch the xiph.org / RFC 9639 test streams. If soundfile or libFLAC is
ever present, tests/test_multimodal_codecs.py's plugin-gated paths pin
against it automatically. (ADPCM left this list in r11 — CPython's
audioop IS the IMA reference codec; see tests/test_adpcm_audioop.py.)
"""

from __future__ import annotations

import struct

import numpy as np

FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# CRCs (spec polynomials, init 0)
# ---------------------------------------------------------------------------


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


# ---------------------------------------------------------------------------
# bit IO (MSB first)
# ---------------------------------------------------------------------------


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
            n -= take
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _Writer:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def swrite(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _samples_md5(x: np.ndarray, bps: int) -> bytes:
    """MD5 of the unencoded audio per the FLAC spec (RFC 9639 STREAMINFO):
    signed little-endian samples, channel-interleaved, sample size rounded
    up to whole bytes. `x` is the (n, ch) int array."""
    import hashlib

    nbytes = (bps + 7) // 8
    flat = np.ascontiguousarray(x.astype(np.int64)).reshape(-1)
    v = flat & ((1 << (8 * nbytes)) - 1)  # two's-complement truncation
    b = np.empty((flat.size, nbytes), np.uint8)
    for i in range(nbytes):
        b[:, i] = (v >> (8 * i)) & 0xFF
    return hashlib.md5(b.tobytes()).digest()


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (samples (n,) mono or (n, ch), sample_rate). Output
    dtype int16 for bps<=16 else int32."""
    samples, rate, _ = decode_flac_info(payload)
    return samples, rate


def decode_flac_info(
    payload: bytes, verify_md5: bool = True
) -> tuple[np.ndarray, int, int]:
    """decode_flac plus the stream's STREAMINFO bits-per-sample — needed by
    callers that scale to full-range floats (the numpy container dtype is
    wider than bps for 8/12/20/24-bit streams, so dtype alone cannot give
    the right full-scale divisor).

    verify_md5 (default on): when STREAMINFO carries a non-zero MD5 — every
    canonical encoder (libFLAC, ffmpeg) writes one — the decoded samples
    are hashed per the spec serialization and a mismatch raises. This
    makes any real-world FLAC file a SELF-VALIDATING canonical pin: our
    decoder's output provably equals what the canonical encoder hashed
    (r11 — the strongest check available in a container with no libFLAC)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = payload[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if btype == 0:
            r = _Reader(body)
            r.read(16), r.read(16)  # min/max block size
            r.read(24), r.read(24)  # min/max frame size
            rate = r.read(20)
            nch = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            streaminfo = {"rate": rate, "nch": nch, "bps": bps,
                          "total": total, "md5": bytes(body[18:34])}
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")

    chans_out: list[list[int]] = [[] for _ in range(streaminfo["nch"])]
    n = len(payload)
    while pos < n - 1:
        # frame sync
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
            raise ValueError(f"lost frame sync at {pos}")
        r = _Reader(payload, pos)
        r.read(14)  # sync
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        # UTF-8 coded frame/sample number
        lead = r.read(8)
        extra = 0
        while lead & (0x80 >> extra) and extra < 7:
            extra += 1
        extra = max(0, extra - 1) if lead & 0x80 else 0
        for _ in range(extra):
            r.read(8)
        # block size
        if bs_code == 1:
            bsize = 192
        elif 2 <= bs_code <= 5:
            bsize = 576 << (bs_code - 2)
        elif bs_code == 6:
            bsize = r.read(8) + 1
        elif bs_code == 7:
            bsize = r.read(16) + 1
        elif bs_code >= 8:
            bsize = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved block size code")
        # sample rate follow-ups (values themselves come from STREAMINFO)
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        r.read(8)  # CRC-8 of the header (already consumed bits are aligned)
        # sample size
        ss_map = {0: streaminfo["bps"], 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
        bps = ss_map.get(ss_code)
        if bps is None:
            raise ValueError("reserved sample size code")

        if ch_code <= 7:
            nch_f = ch_code + 1
            kinds = ["indep"] * nch_f
        elif ch_code == 8:
            nch_f, kinds = 2, ["left", "side"]
        elif ch_code == 9:
            nch_f, kinds = 2, ["side", "right"]
        elif ch_code == 10:
            nch_f, kinds = 2, ["mid", "side"]
        else:
            raise ValueError("reserved channel assignment")

        subs = []
        for ci in range(nch_f):
            sub_bps = bps + (1 if kinds[ci] == "side" else 0)
            subs.append(_decode_subframe(r, bsize, sub_bps))
        r.align()
        r.read(16)  # frame CRC-16
        pos = r.byte

        if ch_code == 8:  # left/side
            left = subs[0]
            side = subs[1]
            right = [left[i] - side[i] for i in range(bsize)]
            frames = [left, right]
        elif ch_code == 9:  # right/side: side = left - right
            side, right = subs[0], subs[1]
            left = [right[i] + side[i] for i in range(bsize)]
            frames = [left, right]
        elif ch_code == 10:  # mid/side
            mid, side = subs[0], subs[1]
            frames_l, frames_r = [], []
            for i in range(bsize):
                m = (mid[i] << 1) | (side[i] & 1)
                frames_l.append((m + side[i]) >> 1)
                frames_r.append((m - side[i]) >> 1)
            frames = [frames_l, frames_r]
        else:
            frames = subs
        for ci in range(streaminfo["nch"]):
            chans_out[ci].extend(frames[ci])
        total_done = len(chans_out[0])
        if streaminfo["total"] and total_done >= streaminfo["total"]:
            break

    total = streaminfo["total"] or len(chans_out[0])
    # Decoded samples can transiently exceed the output width (mid/side
    # reconstruction, wasted-bits shifts on hostile streams); the format's
    # semantics are two's-complement wraparound at the output width.  Build
    # in int64 and mask explicitly — np.asarray(py_int_list, np.int16) with
    # out-of-bound values is a DeprecationWarning today and a hard error in
    # future NumPy.
    if streaminfo["bps"] <= 16:
        arrs = [
            (np.asarray(c[:total], dtype=np.int64) & 0xFFFF)
            .astype(np.uint16)
            .view(np.int16)
            for c in chans_out
        ]
    else:
        arrs = [
            (np.asarray(c[:total], dtype=np.int64) & 0xFFFFFFFF)
            .astype(np.uint32)
            .view(np.int32)
            for c in chans_out
        ]
    stacked = np.stack(arrs, axis=-1)
    if verify_md5 and streaminfo["md5"] != b"\x00" * 16:
        got = _samples_md5(stacked, streaminfo["bps"])
        if got != streaminfo["md5"]:
            raise ValueError(
                "decoded-audio MD5 mismatch vs STREAMINFO "
                f"(got {got.hex()}, header {streaminfo['md5'].hex()}) — "
                "corrupt stream or decoder defect"
            )
    out = arrs[0] if streaminfo["nch"] == 1 else stacked
    return out, streaminfo["rate"], streaminfo["bps"]


def _decode_subframe(r: _Reader, bsize: int, bps: int) -> list[int]:
    r.read(1)  # zero pad
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = r.sread(bps)
        out = [v] * bsize
    elif stype == 1:  # VERBATIM
        out = [r.sread(bps) for _ in range(bsize)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype & 0x07
        warm = [r.sread(bps) for _ in range(order)]
        resid = _decode_residual(r, bsize, order)
        out = list(warm)
        coefs = FIXED_COEFS[order]
        for i in range(order, bsize):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coefs))
            out.append(resid[i - order] + pred)
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        warm = [r.sread(bps) for _ in range(order)]
        prec = r.read(4) + 1
        shift = r.sread(5)
        coefs = [r.sread(prec) for _ in range(order)]
        resid = _decode_residual(r, bsize, order)
        out = list(warm)
        for i in range(order, bsize):
            pred = sum(coefs[j] * out[i - 1 - j] for j in range(order)) >> shift
            out.append(resid[i - order] + pred)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_residual(r: _Reader, bsize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = r.read(4)
    nparts = 1 << po
    out: list[int] = []
    for p in range(nparts):
        cnt = (bsize >> po) - (order if p == 0 else 0)
        param = r.read(plen)
        if param == escape:
            nbits = r.read(5)
            for _ in range(cnt):
                out.append(r.sread(nbits) if nbits else 0)
        else:
            for _ in range(cnt):
                q = r.unary()
                u = (q << param) | (r.read(param) if param else 0)
                out.append((u >> 1) ^ -(u & 1))
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rice_param(resid: list[int]) -> int:
    if not resid:
        return 0
    mean = sum(abs(v) for v in resid) / len(resid) + 1e-9
    p = max(0, int(np.ceil(np.log2(mean + 1))))
    return min(p, 14)


def _rice_cost(resid: list[int], p: int) -> int:
    return sum((((v << 1) ^ (v >> 63)) >> p) + 1 + p for v in resid)


def _fixed_residual(x: list[int], order: int) -> list[int]:
    coefs = FIXED_COEFS[order]
    return [
        x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(x))
    ]


def _encode_subframe(w: _Writer, x: list[int], bps: int) -> None:
    n = len(x)
    if all(v == x[0] for v in x):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.swrite(x[0], bps)
        return
    # choose FIXED order 0-2 by rice cost, fall back to VERBATIM
    best = None
    for order in (0, 1, 2):
        if n <= order:
            continue
        resid = _fixed_residual(x, order)
        p = _rice_param(resid)
        cost = order * bps + _rice_cost(resid, p)
        if best is None or cost < best[0]:
            best = (cost, order, resid, p)
    if best is None or best[0] >= n * bps:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in x:
            w.swrite(v, bps)
        return
    _, order, resid, p = best
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)  # no wasted bits
    for v in x[:order]:
        w.swrite(v, bps)
    # residual: method 0 (4-bit rice), partition order 0
    w.write(0, 2)
    w.write(0, 4)
    w.write(p, 4)
    for v in resid:
        u = (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1
        q, rem = u >> p, u & ((1 << p) - 1)
        for _ in range(q):
            w.write(0, 1)
        w.write(1, 1)
        if p:
            w.write(rem, p)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead_bits = 7 - nbytes
    shift = 6 * (nbytes - 1)
    out.append((0xFF << (lead_bits + 1)) & 0xFF | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def encode_flac(samples: np.ndarray, sample_rate: int, block_size: int = 4096) -> bytes:
    """int numpy samples ((n,) mono or (n, ch)) -> FLAC bytes. bps is 16
    for int16 input, 8 for int8. Lossless by construction."""
    samples = np.asarray(samples)
    if samples.dtype == np.int8:
        bps = 8
    elif samples.dtype == np.int16:
        bps = 16
    else:
        raise ValueError("encode_flac supports int8/int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    total, nch = samples.shape
    if not 1 <= nch <= 8:
        raise ValueError("1-8 channels")

    out = bytearray(b"fLaC")
    si = _Writer()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.align()
    # real MD5 (canonical encoders always write one): lets ANY spec
    # decoder — including ours — verify the round trip end-to-end
    body = bytes(si.out) + _samples_md5(samples, bps)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_idx = 0
    for start in range(0, total, block_size):
        blk = samples[start : start + block_size]
        bsize = blk.shape[0]
        hw = _Writer()
        hw.write(0b11111111111110, 14)
        hw.write(0, 1)
        hw.write(0, 1)  # fixed blocksize strategy
        hw.write(7, 4)  # blocksize: 16-bit at end
        hw.write(0, 4)  # sample rate: from STREAMINFO
        hw.write(nch - 1, 4)  # independent channels
        hw.write({8: 1, 16: 4}[bps], 3)
        hw.write(0, 1)
        hw.align()
        header = bytes(hw.out) + _utf8_number(frame_idx) + struct.pack(">H", bsize - 1)
        header += bytes([_crc8(header)])

        bw = _Writer()
        for ci in range(nch):
            _encode_subframe(bw, [int(v) for v in blk[:, ci]], bps)
        bw.align()
        frame = header + bytes(bw.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_idx += 1
    return bytes(out)
