"""Live javax.sound interop for the G.711 (mu-law / A-law) WAV decode
path (pipeline/codecs.py decode_wav, format tags 7/6): a WAV whose data
chunk is the EXHAUSTIVE 256-code byte ramp is parsed by the JVM's
AudioSystem (canonical Sun ULAW/ALAW codecs) and converted to 16-bit
PCM; our decode table scaled by 32768 must match every one of the 256
linear values exactly. Also pins WAV-container parsing of the compressed
format tags against an independent reader."""

import struct

import numpy as np
import pytest


def _audio(spark):
    jvm = spark._jvm
    try:
        jvm.javax.sound.sampled.AudioSystem
    except Exception:
        pytest.skip("JVM javax.sound not reachable via py4j")
    return jvm


def _g711_wav(tag: int, data: bytes, rate: int = 8000) -> bytes:
    """Minimal mono 8-bit WAV with fmt tag 6 (A-law) or 7 (mu-law) + the
    fact chunk compressed formats carry."""
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8) + struct.pack(
        "<H", 0
    )  # cbSize=0 extension — present in real G.711 WAVs
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(data))
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def jvm_decode_to_pcm16(spark, wav: bytes) -> np.ndarray:
    """JVM AudioSystem: parse the WAV, convert to PCM_SIGNED 16-bit LE,
    return int16 samples."""
    jvm = _audio(spark)
    bis = jvm.java.io.ByteArrayInputStream(wav)
    src = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(bis)
    f = src.getFormat()
    target = jvm.javax.sound.sampled.AudioFormat(
        jvm.javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate(), 16, f.getChannels(), 2 * f.getChannels(),
        f.getSampleRate(), False,
    )
    pcm = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(target, src)
    raw = bytes(pcm.readAllBytes())
    return np.frombuffer(raw, dtype="<i2")


@pytest.mark.parametrize("law,tag", [("ulaw", 7), ("alaw", 6)])
def test_g711_tables_match_jvm_exhaustively(spark, law, tag):
    data = bytes(range(256))
    wav = _g711_wav(tag, data)
    theirs = jvm_decode_to_pcm16(spark, wav)

    from enterprise_warp_spark.pipeline.codecs import decode_wav

    ours, rate = decode_wav(wav)
    assert rate == 8000 and ours.shape == (256, 1)
    ours16 = np.rint(ours[:, 0] * 32768.0).astype(np.int64)
    assert theirs.shape == (256,)
    diff = np.abs(ours16 - theirs.astype(np.int64))
    assert diff.max() == 0, (
        f"{law}: {int((diff > 0).sum())} of 256 codes disagree; "
        f"worst code {int(np.argmax(diff))}: ours {ours16[np.argmax(diff)]} "
        f"vs JVM {theirs[np.argmax(diff)]}"
    )


def test_g711_stereo_interleave_matches_jvm(spark):
    """Two-channel mu-law: interleaved channel split must agree with the
    JVM's frame layout, not just per-byte table decode."""
    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 256, 500, dtype=np.uint8))
    fmt = struct.pack("<HHIIHH", 7, 2, 8000, 16000, 2, 8) + struct.pack("<H", 0)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(data) // 2)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    theirs = jvm_decode_to_pcm16(spark, wav).reshape(-1, 2)

    from enterprise_warp_spark.pipeline.codecs import decode_wav

    ours, _ = decode_wav(wav)
    ours16 = np.rint(ours * 32768.0).astype(np.int64)
    assert np.array_equal(ours16, theirs.astype(np.int64))
