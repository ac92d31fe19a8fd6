"""MP3 metadata parser (pipeline/mp3meta.py) vs hand-computed fixtures
from the published MPEG audio tables (ISO/IEC 11172-3 / 13818-3) —
independent arithmetic here, never the module's own helpers — plus
hostile-byte robustness and the Spark mapInPandas wrapper."""

import struct

import pytest

from enterprise_warp_spark.pipeline.mp3meta import mp3_meta, parse_mp3_meta


def _frame_v1l3_128_44100(pad=0) -> bytes:
    """The classic frame: MPEG-1 Layer III, 128 kbps, 44.1 kHz, joint
    stereo, no CRC. Length = floor(144 * 128000 / 44100) + pad = 417+pad
    (independent arithmetic: 144*128000 = 18432000; // 44100 = 417)."""
    hdr = bytes([0xFF, 0xFB, 0x90 | (pad << 1), 0x40])
    return hdr + b"\xAA" * (417 + pad - 4)


def _frame_v2l3_64_22050() -> bytes:
    """MPEG-2 Layer III, 64 kbps, 22.05 kHz, mono: 576 samples/frame, so
    length = floor(72 * 64000 / 22050) = 208."""
    # version 10, layer 01, nocrc 1 -> byte1 0b11110011 = 0xF3
    # bitrate idx 8 (64 in the V2 L3 row), rate idx 0, pad 0 -> 0x80
    # mode 11 mono -> 0xC0
    hdr = bytes([0xFF, 0xF3, 0x80, 0xC0])
    return hdr + b"\xBB" * (208 - 4)


def _id3v2(frames: dict) -> bytes:
    body = b""
    for fid, text in frames.items():
        payload = b"\x00" + text.encode("latin-1")
        body += fid.encode() + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    size = len(body)
    syncsafe = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    )
    return b"ID3\x03\x00\x00" + syncsafe + body


def test_cbr_stream_frames_and_duration():
    n = 38
    meta = parse_mp3_meta(_frame_v1l3_128_44100() * n)
    assert meta["ok"] and meta["version"] == "1" and meta["layer"] == 3
    assert meta["bitrate_kbps"] == 128 and meta["sample_rate"] == 44100
    assert meta["channels"] == 2 and meta["mode"] == "joint"
    assert meta["n_frames"] == n and meta["vbr"] is False
    assert meta["duration_s"] == pytest.approx(n * 1152 / 44100, abs=1e-6)


def test_padded_frames_walk_correctly():
    """Alternating pad bit: frame lengths 417/418 — a wrong pad handling
    desyncs the walk immediately."""
    stream = (_frame_v1l3_128_44100(0) + _frame_v1l3_128_44100(1)) * 10
    meta = parse_mp3_meta(stream)
    assert meta["n_frames"] == 20


def test_mpeg2_mono_table_row():
    meta = parse_mp3_meta(_frame_v2l3_64_22050() * 5)
    assert meta["ok"] and meta["version"] == "2" and meta["channels"] == 1
    assert meta["bitrate_kbps"] == 64 and meta["sample_rate"] == 22050
    assert meta["duration_s"] == pytest.approx(5 * 576 / 22050, abs=1e-6)


def test_vbr_modal_bitrate():
    """Mixed 128/160 frames: vbr flag set, bitrate = the mode."""
    # 160 kbps V1L3 = index 10 -> byte2 0xA0; length 144*160000//44100=522
    f160 = bytes([0xFF, 0xFB, 0xA0, 0x40]) + b"\xCC" * (522 - 4)
    meta = parse_mp3_meta(_frame_v1l3_128_44100() * 7 + f160 * 3)
    assert meta["vbr"] is True and meta["bitrate_kbps"] == 128
    assert meta["n_frames"] == 10


def test_xing_header_detected_and_excluded_from_walk():
    """First frame carries Xing (after the 36-byte header+side-info for
    MPEG-1 stereo): has_xing + the tag's frame count surface, the tag
    frame itself adds no audio, walked count stays authoritative."""
    tag = bytearray(_frame_v1l3_128_44100())
    at = 4 + 32
    tag[at : at + 4] = b"Xing"
    tag[at + 4 : at + 8] = struct.pack(">I", 1)  # flags: frames present
    tag[at + 8 : at + 12] = struct.pack(">I", 1000)  # a lying count
    meta = parse_mp3_meta(bytes(tag) + _frame_v1l3_128_44100() * 6)
    assert meta["has_xing"] is True and meta["xing_frames"] == 1000
    assert meta["n_frames"] == 6
    assert meta["duration_s"] == pytest.approx(6 * 1152 / 44100, abs=1e-6)


def test_id3v2_and_id3v1_tags():
    blob = (
        _id3v2({"TIT2": "A Title", "TPE1": "An Artist"})
        + _frame_v1l3_128_44100() * 3
    )
    meta = parse_mp3_meta(blob)
    assert meta["title"] == "A Title" and meta["artist"] == "An Artist"
    assert meta["id3v2_bytes"] > 10 and meta["n_frames"] == 3
    # v1 trailer fills fields v2 didn't, never overrides v2
    v1 = b"TAG" + b"Old Title".ljust(30, b"\x00") + b"Old Artist".ljust(
        30, b"\x00"
    ) + b"Old Album".ljust(30, b"\x00") + b"\x00" * 35
    meta2 = parse_mp3_meta(blob + v1)
    assert meta2["title"] == "A Title"  # v2 wins
    assert meta2["album"] == "Old Album"  # v1 fills the gap


def _id3v22(frames: dict, compressed=False) -> bytes:
    """ID3v2.2 tag: 3-char frame ids, 3-byte big-endian frame sizes."""
    body = b""
    for fid, text in frames.items():
        payload = b"\x00" + text.encode("latin-1")
        body += fid.encode() + len(payload).to_bytes(3, "big") + payload
    size = len(body)
    syncsafe = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F,
         size & 0x7F]
    )
    flags = 0x40 if compressed else 0x00
    return b"ID3\x02\x00" + bytes([flags]) + syncsafe + body


def test_id3v22_three_char_frames():
    """v2.2 layout (the r12-advice gap): TT2/TP1/TAL must map to
    title/artist/album through the 6-byte frame headers."""
    blob = (
        _id3v22({"TT2": "Old Title", "TP1": "Old Artist", "TAL": "An LP"})
        + _frame_v1l3_128_44100() * 3
    )
    meta = parse_mp3_meta(blob)
    assert meta["title"] == "Old Title" and meta["artist"] == "Old Artist"
    assert meta["album"] == "An LP"
    assert meta["n_frames"] == 3  # tag size still skips to the audio


def test_id3v22_compressed_tag_skipped_whole():
    """The v2.2 compression bit: spec says ignore the entire tag — but
    its SIZE must still be honoured so the frame walk starts at audio."""
    blob = _id3v22({"TT2": "Hidden"}, compressed=True) + \
        _frame_v1l3_128_44100() * 4
    meta = parse_mp3_meta(blob)
    assert meta["title"] is None
    assert meta["n_frames"] == 4


def test_id3v2_unsynchronised_tag():
    """Unsynchronisation (header flag 0x80): every FF in the tag body is
    stored as FF 00; the parser must invert that before the frame walk.
    Text with a real 0xFF byte (latin-1 'ÿ') exercises the inversion."""
    body = b""
    for fid, text in (("TIT2", "y\xffz"), ("TPE1", "A\xffB")):
        payload = b"\x00" + text.encode("latin-1")
        body += fid.encode() + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    unsynced = body.replace(b"\xff", b"\xff\x00")
    size = len(unsynced)
    syncsafe = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F,
         size & 0x7F]
    )
    blob = (
        b"ID3\x03\x00\x80" + syncsafe + unsynced
        + _frame_v1l3_128_44100() * 2
    )
    meta = parse_mp3_meta(blob)
    assert meta["title"] == "y\xffz" and meta["artist"] == "A\xffB"
    assert meta["n_frames"] == 2


def test_id3v22_unsynchronised_tag():
    """v2.2 unsynchronisation is TAG-WIDE like v2.3 (frame sizes count
    decoded bytes) — the r13 v2.4 fix restricted the whole-tag decode to
    major == 3 and silently garbled unsynced v2.2 tags (r14 review)."""
    body = b""
    for fid, text in (("TT2", "y\xffz"), ("TP1", "A\xffB")):
        payload = b"\x00" + text.encode("latin-1")
        body += fid.encode() + len(payload).to_bytes(3, "big") + payload
    unsynced = body.replace(b"\xff", b"\xff\x00")
    size = len(unsynced)
    syncsafe = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F,
         size & 0x7F]
    )
    blob = (
        b"ID3\x02\x00\x80" + syncsafe + unsynced
        + _frame_v1l3_128_44100() * 2
    )
    meta = parse_mp3_meta(blob)
    assert meta["title"] == "y\xffz" and meta["artist"] == "A\xffB"
    assert meta["n_frames"] == 2


def test_resync_over_garbage():
    blob = (
        _frame_v1l3_128_44100()
        + b"\x00\x11\x22" * 40  # inter-frame garbage
        + _frame_v1l3_128_44100()
    )
    meta = parse_mp3_meta(blob)
    assert meta["n_frames"] == 2


def test_hostile_inputs_never_raise():
    import random

    rng = random.Random(8)
    for payload in (
        b"",
        b"\x00" * 100,
        b"ID3",  # truncated tag header
        _id3v2({"TIT2": "x"})[:12],  # truncated tag body
        _frame_v1l3_128_44100()[:100],  # truncated frame
        bytes(rng.getrandbits(8) for _ in range(5000)),
        b"\xff\xfb" + b"\xff" * 2,  # sync then junk
    ):
        meta = parse_mp3_meta(payload)
        assert isinstance(meta["ok"], bool)
    assert parse_mp3_meta(b"")["ok"] is False


def test_spark_mp3_meta_kernel(spark):
    rows = [
        (1, _id3v2({"TIT2": "One"}) + _frame_v1l3_128_44100() * 4),
        (2, _frame_v2l3_64_22050() * 2),
        (3, b"not audio at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mp3_meta(df).collect()}
    assert got[1]["ok"] and got[1]["title"] == "One" and got[1]["n_frames"] == 4
    assert got[2]["sample_rate"] == 22050 and got[2]["channels"] == 1
    assert got[3]["ok"] is False and got[4]["ok"] is False
    # map-only plan: no shuffle anywhere
    plan = mp3_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def _syncsafe4(n: int) -> bytes:
    return bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )


def test_id3v24_unsync_sizes_count_on_disk_bytes():
    """ADVICE r13: in v2.4, frame size fields count the ON-DISK (unsynced)
    bytes and unsynchronisation is per-frame. A first frame whose payload
    contains FF 00 must not desynchronise the walk to the frames after it
    (the old whole-tag FF00->FF replace shifted every later offset)."""
    frames = b""
    for fid, text in (("TIT2", "y\xffz"), ("TPE1", "A\xffB"),
                      ("TALB", "plain")):
        payload = b"\x00" + text.encode("latin-1")
        on_disk = payload.replace(b"\xff", b"\xff\x00")
        # v2.4: syncsafe size = on-disk byte count; format flag 0x02 =
        # this frame is unsynchronised
        frames += (
            fid.encode() + _syncsafe4(len(on_disk)) + b"\x00\x02" + on_disk
        )
    blob = (
        b"ID3\x04\x00\x00" + _syncsafe4(len(frames)) + frames
        + _frame_v1l3_128_44100() * 2
    )
    meta = parse_mp3_meta(blob)
    assert meta["title"] == "y\xffz"
    assert meta["artist"] == "A\xffB"
    assert meta["album"] == "plain"  # the frame AFTER the unsynced ones
    assert meta["n_frames"] == 2

    # tag-level unsync flag (0x80): every frame stored unsynced, sizes
    # still on-disk — same walk, same answers
    blob2 = b"ID3\x04\x00\x80" + _syncsafe4(len(frames)) + frames.replace(
        b"\x00\x02", b"\x00\x00"
    ) + _frame_v1l3_128_44100()
    meta2 = parse_mp3_meta(blob2)
    assert meta2["title"] == "y\xffz" and meta2["artist"] == "A\xffB"


def test_id3v24_data_length_indicator_prefix_skipped():
    """v2.4 format flag 0x01 prepends a 4-byte data-length indicator to
    the payload; the text decoder must skip it."""
    payload = b"\x00" + b"DLI title"
    frame = (
        b"TIT2" + _syncsafe4(4 + len(payload)) + b"\x00\x01"
        + _syncsafe4(len(payload)) + payload
    )
    blob = b"ID3\x04\x00\x00" + _syncsafe4(len(frame)) + frame
    assert parse_mp3_meta(blob)["title"] == "DLI title"
