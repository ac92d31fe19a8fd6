"""Ogg/Vorbis codec: hermetic fixtures from the in-module minimal encoder
(the FLAC/ADPCM pattern) — round-trip SNR, container robustness, spec
corner cases, and the Spark-side media-kernel integration."""

from __future__ import annotations

import numpy as np
import pytest

from enterprise_warp_spark.pipeline.vorbis import (
    BitReader,
    BitWriter,
    INVERSE_DB,
    assign_codewords,
    decode_vorbis,
    encode_vorbis,
    float32_pack,
    float32_unpack,
    ogg_crc,
    ogg_pages_to_packets,
)


def _sig(n=6000, rate=16000):
    t = np.arange(n) / rate
    return (
        0.6 * np.sin(2 * np.pi * 440 * t)
        + 0.25 * np.sin(2 * np.pi * 1333 * t + 0.7)
        + 0.1 * np.sin(2 * np.pi * 3721 * t + 1.3)
    )


def _snr(ref, out):
    n = min(len(ref), len(out))
    err = out[:n] - ref[:n]
    return 10 * np.log10(np.sum(ref[:n] ** 2) / max(np.sum(err**2), 1e-300))


def test_bitio_round_trip():
    bw = BitWriter()
    vals = [(5, 3), (0, 1), (1023, 10), (0x564342, 24), (1, 1), (77, 7)]
    for v, n in vals:
        bw.write(v, n)
    br = BitReader(bw.getvalue())
    for v, n in vals:
        assert br.read(v.bit_length() if False else n) == v


def test_float32_pack_unpack():
    for v in (0.0, 1.0, -1.0, 0.5, 149.9949951171875, -1124.96, 1e-6, 3e5):
        got = float32_unpack(float32_pack(v))
        assert got == pytest.approx(v, rel=1e-5, abs=1e-12)


def test_codeword_assignment_canonical():
    # lengths [2,2,2,2] -> codes 00 01 10 11 in entry order
    codes = assign_codewords([2, 2, 2, 2])
    assert codes == {0: (0, 2), 1: (1, 2), 2: (2, 2), 3: (3, 2)}
    # mixed lengths (spec-style example): entry0 len1 -> 0; entry1 len2 ->
    # 10; entry2 len2 -> 11
    codes = assign_codewords([1, 2, 2])
    assert codes == {0: (0, 1), 1: (2, 2), 2: (3, 2)}
    with pytest.raises(ValueError):
        assign_codewords([1, 1, 1])  # over-specified
    with pytest.raises(ValueError):
        assign_codewords([2, 2, 2])  # under-specified (incomplete tree)


def test_inverse_db_table_matches_spec_endpoints():
    """The computed table reproduces the spec's printed
    floor1_inverse_dB_table: 1.0649863e-07 at index 0, 0.82788260 at 248,
    1.0 at 255 (float32-print precision)."""
    assert INVERSE_DB[255] == pytest.approx(1.0)
    assert INVERSE_DB[0] == pytest.approx(1.0649863e-07, rel=1e-5)
    assert INVERSE_DB[252] == pytest.approx(0.82788260, rel=1e-5)
    assert INVERSE_DB[253] == pytest.approx(0.88168307, rel=1e-5)
    assert INVERSE_DB[254] == pytest.approx(0.9389798, rel=1e-5)


def test_round_trip_mono_snr():
    x = _sig()
    payload = encode_vorbis(x, 16000)
    out, rate = decode_vorbis(payload)
    assert rate == 16000
    assert out.shape == (len(x), 1)
    assert _snr(x, out[:, 0]) > 30.0
    # really compressed vs 16-bit PCM
    assert len(payload) < x.size * 2


def test_round_trip_stereo_snr():
    x = _sig()
    st = np.stack([x, np.roll(x, 100)], axis=1)
    out, rate = decode_vorbis(encode_vorbis(st, 16000))
    assert out.shape == st.shape
    assert _snr(st[:, 0], out[:, 0]) > 30.0
    assert _snr(st[:, 1], out[:, 1]) > 30.0


def test_round_trip_noise_and_quant_depth():
    rng = np.random.default_rng(3)
    x = np.clip(rng.standard_normal(4000) * 0.25, -1, 1)
    coarse = _snr(x, decode_vorbis(encode_vorbis(x, 8000, two_pass=False))[0][:, 0])
    fine = _snr(x, decode_vorbis(encode_vorbis(x, 8000, two_pass=True))[0][:, 0])
    assert fine > coarse + 15  # the refinement pass buys real bits
    assert fine > 25.0


def test_blocksize_variants():
    x = _sig(5000)
    for bs in (128, 256, 1024):
        out, _ = decode_vorbis(encode_vorbis(x, 16000, blocksize=bs))
        assert out.shape[0] == len(x)
        assert _snr(x, out[:, 0]) > 25.0, bs


def test_ogg_crc_detects_corruption():
    payload = bytearray(encode_vorbis(_sig(2000), 16000))
    # flip one bit inside the first page body
    payload[40] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        list(ogg_pages_to_packets(bytes(payload)))


def test_ogg_lost_sync_raises():
    with pytest.raises(ValueError):
        list(ogg_pages_to_packets(b"NotAnOggStream" + b"\x00" * 40))


def test_truncated_stream_and_granule_clamp():
    x = _sig(3000)
    out, _ = decode_vorbis(encode_vorbis(x, 16000))
    # decoded length equals the true sample count (the encoder's padding
    # is clamped away by the final granule position)
    assert out.shape[0] == 3000


def test_floor0_raises_not_implemented():
    """A setup header declaring floor type 0 (LSP) hits the documented
    NotImplementedError boundary, not a silent wrong answer."""
    import enterprise_warp_spark.pipeline.vorbis as V

    bw = V.BitWriter()
    bw.write(0, 8)  # one codebook
    V._write_codebook(bw, 1, [1, 1], 0, 0, 0, 0, [])
    bw.write(0, 6)
    bw.write(0, 16)  # one time transform, type 0
    bw.write(0, 6)
    bw.write(0, 16)  # one floor, type 0 (LSP)
    with pytest.raises(NotImplementedError, match="floor type 0"):
        V.parse_setup_header(b"\x05vorbis" + bw.getvalue(), 1)


def test_vorbis_mime_decodes_for_real_in_spark(spark):
    """audio/ogg rows get decoded=true with NO optional plugins, and the
    spectral fingerprint matches the WAV twin of the same signal (the
    FLAC invariance contract, loosened to the lossy codec's tolerance)."""
    from enterprise_warp_spark.pipeline.codecs import (
        audio_features,
        decode_audio,
        encode_wav,
    )
    from enterprise_warp_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    x = _sig(4000)
    ogg = encode_vorbis(x, 16000)
    wav = encode_wav(x[:, None], 16000)  # encode_wav takes floats in [-1, 1]
    media = spark.createDataFrame(
        [
            (1, "audio", ogg, "audio/ogg", None, None, 16000, None),
            (2, "audio", wav, "audio/wav", None, None, 16000, None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in extract_features(media, decoders={}).collect()}
    assert rows[1]["decoded"] is True and rows[2]["decoded"] is True
    f_ogg = np.array(rows[1]["feature"])
    f_wav = np.array(rows[2]["feature"])
    # same signal -> same spectral shape within lossy tolerance
    assert np.allclose(f_ogg, f_wav, rtol=0.1, atol=0.05), (f_ogg, f_wav)
    # and the in-process decode agrees with the Spark kernel
    samples, rate = decode_audio(ogg, "audio/ogg")
    assert rate == 16000
    assert rows[1]["feature"] == pytest.approx(
        audio_features(samples, rate)
    )


def test_vorbis_plugin_fallback_kept(spark):
    """When a native audio plugin IS importable it still gets first
    refusal for audio/ogg (the plugin-first contract), and
    prefer_native=False flips to the pure decoder."""
    from enterprise_warp_spark.pipeline.codecs import audio_features
    from enterprise_warp_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    x = _sig(2000)
    ogg = encode_vorbis(x, 16000)

    def fake_audio_decoder(payload: bytes):
        return np.full((100, 1), 0.123), 16000

    media = spark.createDataFrame(
        [(1, "audio", ogg, "audio/ogg", None, None, 16000, None)],
        MEDIA_SCHEMA,
    )
    native = extract_features(
        media, decoders={"audio": fake_audio_decoder}
    ).first()
    assert native["feature"] == pytest.approx(
        audio_features(*fake_audio_decoder(b""))
    )
    pure = extract_features(
        media, decoders={"audio": fake_audio_decoder}, prefer_native=False
    ).first()
    no_plugin = extract_features(media, decoders={}).first()
    assert pure["feature"] == pytest.approx(no_plugin["feature"])


def test_premature_end_of_packet_is_not_an_error():
    """Spec §4.3: running out of bits mid-audio-packet keeps the partial
    decode (zeros beyond) instead of raising — exercised by re-paging a
    stream with its final audio packet cut in half."""
    from enterprise_warp_spark.pipeline.vorbis import ogg_write_pages

    x = _sig(3000)
    payload = encode_vorbis(x, 16000)
    pkts = list(ogg_pages_to_packets(payload))
    cut = [(p[: max(3, len(p) // 2)] if i == len(pkts) - 1 else p)
           for i, (p, _) in enumerate(pkts)]
    grans = [g for _, g in pkts]
    repaged = ogg_write_pages(
        [(p, g if g is not None else 0, True) for p, g in zip(cut, grans)]
    )
    out, rate = decode_vorbis(repaged)
    assert rate == 16000
    assert out.shape[0] == 3000  # granule clamp still applies
    # everything before the truncated packet round-trips fine
    assert _snr(x[:2000], out[:2000, 0]) > 25.0


def test_mixed_blocksize_round_trip():
    """Two-mode stream (short blockflag-0 + long blockflag-1 on the
    L L S L S S schedule): every long-window transition shape — long-long,
    short-prev, short-next, short-both — plus the general offset
    overlap-add ((n_prev + n_cur)/4 centers) round-trips."""
    x = _sig(6000)
    payload = encode_vorbis(x, 16000, blocksize=1024, mixed_blocks=True)
    out, rate = decode_vorbis(payload)
    assert rate == 16000
    assert out.shape == (len(x), 1)
    assert _snr(x, out[:, 0]) > 28.0
    st = np.stack([x, np.roll(x, 64)], axis=1)
    o2, _ = decode_vorbis(
        encode_vorbis(st, 16000, blocksize=512, mixed_blocks=True,
                      short_blocksize=256)
    )
    assert o2.shape == st.shape
    assert _snr(st[:, 0], o2[:, 0]) > 28.0
    assert _snr(st[:, 1], o2[:, 1]) > 28.0


def test_mixed_window_overlap_is_perfect_reconstruction():
    """The decoder's window placement + absolute-offset overlap-add is the
    exact adjoint of the analysis transform for EVERY transition shape:
    machine-precision PR on an unquantized synthetic frame chain."""
    from enterprise_warp_spark.pipeline.vorbis import (
        frame_window,
        imdct_matrix,
    )

    n0, n1 = 8, 32
    sizes = [n1, n1, n0, n0, n1, n0, n1, n1]
    starts = [0]
    for f in range(1, len(sizes)):
        starts.append(starts[-1] + 3 * sizes[f - 1] // 4 - sizes[f] // 4)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(starts[-1] + sizes[-1])
    buf = np.zeros_like(x)
    for f, nf in enumerate(sizes):
        if nf == n0:
            bf, lp, ln = 0, True, True
        else:
            bf = 1
            lp = f == 0 or sizes[f - 1] == n1
            ln = f == len(sizes) - 1 or sizes[f + 1] == n1
        w = frame_window(nf, n0, bf, lp, ln)
        seg = x[starts[f]:starts[f] + nf]
        M = imdct_matrix(nf)
        buf[starts[f]:starts[f] + nf] += (M @ ((4.0 / nf) * (w * seg) @ M)) * w
    c0, cl = sizes[0] // 2, starts[-1] + sizes[-1] // 2
    assert np.abs(buf[c0:cl] - x[c0:cl]).max() < 1e-10


def test_coupled_stereo_round_trip():
    """Square-polar channel coupling: the encoder emits a coupling step
    (magnitude ch0 / angle ch1) and the decoder's spec inverse — whose
    assignment targets SWAP in the A<=0 branches — restores both
    channels. This exercises all four sign branches of §4.3.5."""
    x = _sig(6000)
    t = np.arange(6000) / 16000.0
    st = np.stack(
        [x, 0.9 * x + 0.05 * np.sin(2 * np.pi * 997 * t)], axis=1
    )
    out, rate = decode_vorbis(encode_vorbis(st, 16000, coupled=True))
    assert rate == 16000 and out.shape == st.shape
    assert _snr(st[:, 0], out[:, 0]) > 28.0
    assert _snr(st[:, 1], out[:, 1]) > 20.0
    # the coupled stream really declares a coupling step in its setup
    from enterprise_warp_spark.pipeline.vorbis import (
        parse_id_header,
        parse_setup_header,
    )

    pkts = [p for p, _ in ogg_pages_to_packets(
        encode_vorbis(st, 16000, coupled=True)
    )]
    ch, *_ = parse_id_header(pkts[0])
    setup = parse_setup_header(pkts[2], ch)
    assert setup.mappings[0]["coupling"] == [(0, 1)]


def test_coupling_forward_inverse_exact():
    """The encoder's vectorized forward coupling composed with the spec
    inverse is the identity on every sign combination."""
    rng = np.random.default_rng(5)
    L = rng.uniform(-5, 5, 4096)
    R = rng.uniform(-5, 5, 4096)
    # include exact zeros and ties
    L[:8] = [0, 0, 1, -1, 2, -2, 0, 3]
    R[:8] = [0, 1, 1, -1, -2, 2, -3, 0]
    c1 = (L > 0) & (L > R)
    c2 = ~c1 & (R > 0) & (L <= R)
    c3 = ~c1 & ~c2 & (L <= 0) & (R > L)
    m = np.select([c1, c2, c3], [L, R, L], default=R)
    a = np.select([c1, c2, c3], [L - R, L - R, R - L], default=R - L)
    pos_m, pos_a = m > 0, a > 0
    new_m = np.where(pos_m, np.where(pos_a, m, m + a),
                     np.where(pos_a, m, m - a))
    new_a = np.where(pos_m, np.where(pos_a, m - a, m),
                     np.where(pos_a, m + a, m))
    assert np.allclose(new_m, L, atol=0) and np.allclose(new_a, R, atol=0)


def test_vorbis_audio_fingerprint(spark):
    """The perceptual-fingerprint kernel treats audio/ogg as a real
    decodable mime (decoded=true, non-null fingerprint), and the Vorbis
    fingerprint lands within near-dup hamming distance of the WAV twin's
    — the FLAC/ADPCM invariance contract."""
    from enterprise_warp_spark.pipeline.codecs import encode_wav
    from enterprise_warp_spark.pipeline.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprints,
    )

    x = _sig(4000)
    media = spark.createDataFrame(
        [
            (1, "audio", encode_vorbis(x, 16000), "audio/ogg",
             None, None, 16000, None),
            (2, "audio", encode_wav(x[:, None], 16000), "audio/wav",
             None, None, 16000, None),
        ],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in audio_fingerprints(media).collect()}
    assert rows[1]["decoded"] is True and rows[1]["fingerprint"] is not None
    ham = bin((rows[1]["fingerprint"] ^ rows[2]["fingerprint"])
              & 0xFFFFFFFFFFFFFFFF).count("1")
    # lossy codec: envelope-derivative bits near their thresholds can flip
    # (measured 9 of 64); anything far under half the bits is the same
    # track, a different track sits near 32
    assert ham <= 16, ham


@pytest.mark.parametrize("rtype", [0, 1, 2])
def test_residue_types_all_round_trip(rtype):
    """Residue type 0 (stride-interleaved partitions), 1 (sequential
    per-channel) and 2 (channel-interleaved) all decode; the encoder can
    emit each, so the three decode layouts are pinned end-to-end."""
    x = _sig(5000)
    out, _ = decode_vorbis(encode_vorbis(x, 16000, residue_type=rtype))
    assert out.shape[0] == len(x)
    assert _snr(x, out[:, 0]) > 30.0


def test_residue_type_01_stereo_rejected():
    x = np.stack([_sig(2000), _sig(2000)], axis=1)
    with pytest.raises(ValueError, match="MONO"):
        encode_vorbis(x, 16000, residue_type=1)


def test_ordered_codebook_parse():
    """Ordered length lists (run-length coded ascending) parse to the
    same codebook as the unordered spelling."""
    from enterprise_warp_spark.pipeline.vorbis import (
        BitReader,
        BitWriter,
        ilog,
        parse_codebook,
    )

    # lengths: entry0 -> 1, entries 1..2 -> 2  (complete tree)
    bw = BitWriter()
    bw.write(0x564342, 24)
    bw.write(1, 16)   # dims
    bw.write(3, 24)   # entries
    bw.write(1, 1)    # ordered
    bw.write(0, 5)    # initial length 1 (-1 coded)
    # count of entries at length 1: ilog(3 - 0) = 2 bits
    bw.write(1, ilog(3))
    # count at length 2: ilog(3 - 1) = 2 bits
    bw.write(2, ilog(2))
    bw.write(0, 4)    # lookup 0
    cb = parse_codebook(BitReader(bw.getvalue()))
    assert cb.lengths == [1, 2, 2]
    # decode round trip: codes 0 / 10 / 11
    dec = BitWriter()
    for bits in ([0], [1, 0], [1, 1]):
        for b in bits:
            dec.write(b, 1)
    br = BitReader(dec.getvalue())
    assert [cb.decode_scalar(br) for _ in range(3)] == [0, 1, 2]


def test_sparse_codebook_parse_and_single_entry():
    """Sparse flag: unused entries carry no length bits; a single USED
    entry decodes by consuming its coded length and returning it."""
    from enterprise_warp_spark.pipeline.vorbis import (
        BitReader,
        BitWriter,
        parse_codebook,
    )

    bw = BitWriter()
    bw.write(0x564342, 24)
    bw.write(1, 16)
    bw.write(4, 24)   # 4 entries
    bw.write(0, 1)    # unordered
    bw.write(1, 1)    # sparse
    for e in range(4):
        used = 1 if e == 2 else 0
        bw.write(used, 1)
        if used:
            bw.write(3 - 1, 5)  # length 3
    bw.write(0, 4)
    cb = parse_codebook(BitReader(bw.getvalue()))
    assert cb.lengths == [0, 0, 3, 0]
    assert cb.single == 2
    br = BitReader(b"\x00")  # any 3 bits
    assert cb.decode_scalar(br) == 2
    assert br.pos == 3  # the bits are consumed


def test_lookup_type2_and_sequence_p_tables():
    """Lookup type 2 reads entries*dims explicit multiplicands; the
    sequence_p flag makes each dimension accumulate the previous value."""
    from enterprise_warp_spark.pipeline.vorbis import Codebook

    # type 2: entries=2, dims=2, multiplicands laid out per entry
    cb = Codebook(2, 2, [1, 1], 2, 10.0, 0.5, 0, [1, 2, 3, 4], 4)
    tab = cb.vq_table()
    assert tab[0].tolist() == [10.5, 11.0]   # 10 + 1*.5, 10 + 2*.5
    assert tab[1].tolist() == [11.5, 12.0]
    # sequence_p on a type-1 lattice: dim j adds the previous value
    cb2 = Codebook(2, 4, [2, 2, 2, 2], 1, 0.0, 1.0, 1, [0, 1], 2)
    tab2 = cb2.vq_table()
    # entry 3 -> digits (1, 1) -> v0 = 1, v1 = 1 + v0 = 2
    assert tab2[3].tolist() == [1.0, 2.0]
    assert tab2[1].tolist() == [1.0, 1.0]  # digits (1, 0): v1 = 0 + v0


def test_long_codeword_fallback_walk():
    """Codewords longer than the fast-table width (10) decode through the
    tree-walk fallback; a complete 12-deep book round-trips every entry."""
    from enterprise_warp_spark.pipeline.vorbis import (
        BitReader,
        BitWriter,
        Codebook,
        assign_codewords,
    )

    lengths = list(range(1, 12)) + [12, 12]  # Kraft-complete chain
    cb = Codebook(1, len(lengths), lengths, 0, 0, 0, 0, [], 0)
    codes = assign_codewords(lengths)
    bw = BitWriter()
    order = [3, 12, 0, 11, 7, 10, 1]
    for e in order:
        code, l = codes[e]
        for i in range(l - 1, -1, -1):  # MSB-first on the wire
            bw.write((code >> i) & 1, 1)
    br = BitReader(bw.getvalue())
    assert [cb.decode_scalar(br) for _ in range(len(order))] == order


def test_codeword_assignment_random_complete_trees():
    """Random complete prefix trees (generated by repeatedly splitting a
    leaf) assign without error, satisfy Kraft exactly, stay prefix-free,
    and decode every entry back through the Codebook (mix of fast-table
    and fallback paths)."""
    import random

    from enterprise_warp_spark.pipeline.vorbis import (
        BitReader,
        BitWriter,
        Codebook,
        assign_codewords,
    )

    rng = random.Random(12)
    for trial in range(30):
        depths = [0]
        for _ in range(rng.randrange(1, 40)):
            i = rng.randrange(len(depths))
            d = depths.pop(i)
            if d >= 14:
                depths.append(d)
                continue
            depths += [d + 1, d + 1]
        if len(depths) < 2:
            continue
        rng.shuffle(depths)
        lengths = depths
        codes = assign_codewords(lengths)
        assert sum(2.0 ** -l for l in lengths) == 1.0  # Kraft-complete
        vals = list(codes.values())
        for i, (c1, l1) in enumerate(vals):  # prefix-free, all pairs
            for c2, l2 in vals[i + 1:]:
                if l1 <= l2:
                    assert (c2 >> (l2 - l1)) != c1
                else:
                    assert (c1 >> (l1 - l2)) != c2
        cb = Codebook(1, len(lengths), lengths, 0, 0, 0, 0, [], 0)
        order = list(range(len(lengths)))
        rng.shuffle(order)
        bw = BitWriter()
        for e in order:
            code, l = codes[e]
            for i in range(l - 1, -1, -1):
                bw.write((code >> i) & 1, 1)
        br = BitReader(bw.getvalue())
        assert [cb.decode_scalar(br) for _ in range(len(order))] == order


def test_floor1_multi_post_decode_matches_spec_reference():
    """The multi-post floor1 path (partition classes, neighbor prediction,
    the four val/room branches, Bresenham render) — which the minimal
    encoder's 2-post flat floors never exercise — decodes identically to
    an independent transcription of the spec pseudocode (§7.2.3/§9.2.6)."""
    import enterprise_warp_spark.pipeline.vorbis as V

    # config: 1 partition of class 0 (dim 2, no subclasses, book 1);
    # X list = [0, 64, 16, 48]; multiplier 1 (range 256)
    f = {
        "partition_classes": [0],
        "class_dims": [2],
        "class_subs": [0],
        "class_master": [0],
        "class_books": [[1]],
        "multiplier": 1,
        "x_list": [0, 64, 16, 48],
    }
    # books: dummy classbook + a 256-entry 8-bit scalar book (entry==value
    # after bit reversal is handled inside the codebook machinery)
    books = [
        V.Codebook(1, 2, [1, 1], 0, 0, 0, 0, [], 0),
        V.Codebook(1, 256, [8] * 256, 0, 0, 0, 0, [], 0),
    ]
    codes = V.assign_codewords([8] * 256)

    def spec_reference(y0, y1, vals, n2):
        """Independent transcription of floor-curve synthesis."""
        xs = f["x_list"]
        rng = 256
        fy = [y0, y1] + [0] * (len(xs) - 2)
        step2 = [True, True] + [False] * (len(xs) - 2)
        for i in range(2, len(xs)):
            lo = max((j for j in range(i) if xs[j] < xs[i]),
                     key=lambda j: xs[j])
            hi = min((j for j in range(i) if xs[j] > xs[i]),
                     key=lambda j: xs[j])
            # render_point
            dy = fy[hi] - fy[lo]
            adx = xs[hi] - xs[lo]
            err = abs(dy) * (xs[i] - xs[lo])
            off = err // adx
            pred = fy[lo] - off if dy < 0 else fy[lo] + off
            val = vals[i - 2]
            if val:
                low_room = pred
                high_room = rng - pred
                room = 2 * min(high_room, low_room)
                step2[lo] = step2[hi] = step2[i] = True
                if val >= room:
                    # spec: highroom > lowroom -> val - lowroom + pred
                    #       else               -> pred - val + highroom - 1
                    if high_room > low_room:
                        fy[i] = val - low_room + pred
                    else:
                        fy[i] = pred - val + high_room - 1
                else:
                    fy[i] = (pred - ((val + 1) // 2) if val % 2
                             else pred + val // 2)
            else:
                fy[i] = pred
            fy[i] = max(0, min(rng - 1, fy[i]))
        # render
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        out = [0.0] * n2
        lx, ly = 0, fy[order[0]]
        hx = 0
        for i in order[1:]:
            if not step2[i]:
                continue
            hx, hy = xs[i], fy[i]
            # Bresenham (trunc toward zero)
            dy = hy - ly
            adx = hx - lx
            ady = abs(dy)
            base = -((-dy) // adx) if dy < 0 else dy // adx
            sy = base - 1 if dy < 0 else base + 1
            ady -= abs(base) * adx
            err = 0
            y = ly
            if lx < n2:
                out[lx] = y
            for x in range(lx + 1, min(hx, n2)):
                err += ady
                if err >= adx:
                    err -= adx
                    y += sy
                else:
                    y += base
                out[x] = y
            lx, ly = hx, hy
        for x in range(hx, n2):
            out[x] = ly
        if hx < n2 and hx >= 0:
            out[hx] = ly
        return np.array(
            [V.INVERSE_DB[min(int(v), 255)] for v in out]
        )

    rng_ = np.random.default_rng(3)
    n2 = 80
    for trial in range(40):
        y0, y1 = int(rng_.integers(0, 256)), int(rng_.integers(0, 256))
        vals = [int(rng_.integers(0, 256)) for _ in range(2)]
        bw = V.BitWriter()
        bw.write(1, 1)  # nonzero
        bw.write(y0, 8)
        bw.write(y1, 8)
        for v in vals:
            code, l = codes[v]
            for i in range(l - 1, -1, -1):
                bw.write((code >> i) & 1, 1)
        got = V.decode_floor1(V.BitReader(bw.getvalue()), f, books, n2)
        want = spec_reference(y0, y1, vals, n2)
        assert np.array_equal(got, want), (trial, y0, y1, vals)


def test_truncated_partition_fast_and_slow_paths_agree(monkeypatch):
    """The fixed-length-book bulk read must keep the vectors that fully
    decoded when a packet truncates mid-partition — i.e. decode truncated
    streams bit-identically to the per-vector tree-walk fallback (spec
    keeps everything up to the last available bit)."""
    from enterprise_warp_spark.pipeline import vorbis

    x = _sig(4000)
    payload = encode_vorbis(x, 16000)
    pkts = list(ogg_pages_to_packets(payload))
    grans = [g for _, g in pkts]

    def decode_cut(cut_bytes, force_slow):
        cut = [
            (p[: max(3, len(p) - cut_bytes)] if i == len(pkts) - 1 else p)
            for i, (p, _) in enumerate(pkts)
        ]
        repaged = vorbis.ogg_write_pages(
            [(p, g if g is not None else 0, True) for p, g in zip(cut, grans)]
        )
        if force_slow:
            orig = vorbis.Codebook.__init__

            def patched(self, *a, **k):
                orig(self, *a, **k)
                self.fixed_len = None
                self.rev_entry = None

            monkeypatch.setattr(vorbis.Codebook, "__init__", patched)
            try:
                out, _ = decode_vorbis(repaged)
            finally:
                monkeypatch.setattr(vorbis.Codebook, "__init__", orig)
        else:
            out, _ = decode_vorbis(repaged)
        return out

    # sweep cut points so the truncation lands at several different spots
    # inside the final packet's residue partitions
    for cut_bytes in (1, 2, 3, 5, 8, 13, 21):
        fast = decode_cut(cut_bytes, force_slow=False)
        slow = decode_cut(cut_bytes, force_slow=True)
        assert fast.shape == slow.shape
        assert np.array_equal(fast, slow), f"paths diverge at cut={cut_bytes}"


# ---------------------------------------------------------------------------
# r12 spec anchors: values and formulas PRINTED in the public Vorbis I spec
# / RFC 3533, transcribed independently here (the floor1 §7.2.3 pseudocode
# test's pattern) — external anchors for the primitives the hermetic
# round-trips can't distinguish from a mirrored misreading.
# ---------------------------------------------------------------------------


def test_ilog_spec_examples():
    """Spec §9.2.1 prints these exact examples."""
    from enterprise_warp_spark.pipeline.vorbis import ilog

    assert [ilog(x) for x in (0, 1, 2, 3, 4, 7)] == [0, 1, 2, 2, 3, 3]


def test_float32_unpack_spec_field_layout():
    """§9.2.2: sign bit 31, 10-bit exponent (bias 788) at bits 21-30,
    21-bit mantissa. Hand-packed patterns, not round-trips."""
    from enterprise_warp_spark.pipeline.vorbis import float32_unpack

    assert float32_unpack((788 << 21) | 1) == 1.0
    assert float32_unpack((789 << 21) | 1) == 2.0
    assert float32_unpack(0x80000000 | (788 << 21) | 1) == -1.0
    assert float32_unpack((788 << 21) | 5) == 5.0
    assert float32_unpack((787 << 21) | 1) == 0.5
    assert float32_unpack(0) == 0.0


def test_lookup1_values_spec_definition():
    """§9.2.3: the greatest integer v for which v**dims <= entries."""
    from enterprise_warp_spark.pipeline.vorbis import _lookup1_values

    assert _lookup1_values(8, 3) == 2
    assert _lookup1_values(7, 3) == 1
    assert _lookup1_values(100, 2) == 10
    assert _lookup1_values(1, 1) == 1
    assert _lookup1_values(26, 3) == 2  # 3**3=27 > 26
    assert _lookup1_values(27, 3) == 3


def test_ogg_crc_matches_bitserial_rfc3533():
    """RFC 3533 §6: CRC-32, generator 0x04c11db7, init 0, no reflection,
    no final xor. The module's slice-by-4 implementation vs a from-scratch
    bit-serial transcription of that sentence."""
    import random

    from enterprise_warp_spark.pipeline.vorbis import ogg_crc

    def bitserial(data: bytes) -> int:
        r = 0
        for byte in data:
            for bit in range(7, -1, -1):
                top = (r >> 31) & 1
                r = (r << 1) & 0xFFFFFFFF
                if top ^ ((byte >> bit) & 1):
                    r ^= 0x04C11DB7
        return r

    rng = random.Random(12)
    for n in (0, 1, 3, 4, 5, 17, 64, 257):
        data = bytes(rng.getrandbits(8) for _ in range(n))
        assert ogg_crc(data) == bitserial(data), n
    assert ogg_crc(b"OggS") == bitserial(b"OggS")


def test_imdct_matches_direct_spec_formula():
    """IMDCT as the literal double loop from the spec's inverse-MDCT
    definition: y[n] = sum_k X[k] * cos(pi/(2N) * (2n + 1 + N/2) * (2k+1)),
    transcribed fresh with scalar math.cos — pins the matrix construction
    (the +N/2 phase offset is the classic transcription casualty)."""
    import math
    import random

    from enterprise_warp_spark.pipeline.vorbis import imdct_matrix

    rng = random.Random(5)
    for n in (8, 16, 64):
        X = [rng.uniform(-1, 1) for _ in range(n // 2)]
        want = [
            sum(
                X[k] * math.cos(
                    math.pi / (2 * n) * (2 * i + 1 + n // 2) * (2 * k + 1)
                )
                for k in range(n // 2)
            )
            for i in range(n)
        ]
        got = imdct_matrix(n) @ np.asarray(X)
        assert np.allclose(got, want, atol=1e-12), n


def test_vorbis_window_matches_spec_formula():
    """§4.3.1 window: sin(pi/2 * sin^2((i + 0.5)/n * pi)) — scalar
    transcription vs the vectorized module table."""
    import math

    from enterprise_warp_spark.pipeline.vorbis import vorbis_window

    for n in (16, 256):
        w = vorbis_window(n)
        for i in (0, 1, n // 2, n - 1):
            want = math.sin(
                0.5 * math.pi * math.sin((i + 0.5) / n * math.pi) ** 2
            )
            assert w[i] == pytest.approx(want, abs=1e-15)


def test_no_canonical_vorbis_oracle_in_container():
    """Self-verifying exclusion (r12): the hermetic-only status of the
    Vorbis codec rests on NO canonical implementation existing here. This
    sentinel re-checks every run; if a canonical decoder ever appears,
    it FAILS loudly so the real pin (the soundfile-gated test in
    test_multimodal_codecs.py) gets activated instead of the boundary
    silently rotting."""
    import ctypes.util
    import importlib.util

    libs = {
        n: ctypes.util.find_library(n)
        for n in ("vorbis", "vorbisfile", "vorbisenc", "ogg", "sndfile")
    }
    present = {n: p for n, p in libs.items() if p}
    assert not present, (
        f"canonical Vorbis-capable libraries appeared: {present} — "
        "vendor a canonical-encoder fixture / enable the soundfile pin"
    )
    assert importlib.util.find_spec("soundfile") is None, (
        "soundfile is importable — the gated libvorbis pin in "
        "test_multimodal_codecs.py now runs; drop this sentinel's claim"
    )


# ---------------------------------------------------------------------------
# chained / multiplexed Ogg containers (VERDICT r12 Next #9)
# ---------------------------------------------------------------------------


def _raw_pages(blob: bytes) -> list[bytes]:
    import struct as _struct  # noqa: F401

    pages, pos = [], 0
    while pos < len(blob):
        nsegs = blob[pos + 26]
        body = sum(blob[pos + 27:pos + 27 + nsegs])
        end = pos + 27 + nsegs + body
        pages.append(blob[pos:end])
        pos = end
    return pages


def _with_serial(blob: bytes, serial: int) -> bytes:
    """Rewrite every page's bitstream serial (and CRC), paging intact."""
    import struct as _struct

    out = bytearray()
    for raw in _raw_pages(blob):
        page = bytearray(raw)
        page[14:18] = _struct.pack("<I", serial)
        page[22:26] = b"\x00\x00\x00\x00"
        page[22:26] = _struct.pack("<I", ogg_crc(bytes(page)))
        out += page
    return bytes(out)


def test_chained_ogg_streams_demux_cleanly():
    """Two chain links back to back (fresh BOS + new serial after EOS —
    the radio-stream shape): the default parse follows the FIRST link
    only, ogg_serials lists both, and each link's packets equal the
    standalone parse — no cross-link splicing."""
    from enterprise_warp_spark.pipeline.vorbis import ogg_serials

    a = encode_vorbis(_sig(1500), 16000)
    b = encode_vorbis(np.clip(_sig(2200) * 0.5, -1, 1), 8000)
    sa, sb = 0x11AA22BB, 0x33CC44DD
    chained = _with_serial(a, sa) + _with_serial(b, sb)
    assert ogg_serials(chained) == [sa, sb]
    assert list(ogg_pages_to_packets(chained)) == list(ogg_pages_to_packets(a))
    assert list(ogg_pages_to_packets(chained, serial=sb)) == list(
        ogg_pages_to_packets(b)
    )
    # the primary link decodes bit-identically to its standalone self
    out_chain, rate = decode_vorbis(chained)
    out_solo, rate_solo = decode_vorbis(a)
    assert rate == rate_solo and np.array_equal(out_chain, out_solo)


def test_multiplexed_ogg_pages_demux_per_serial():
    """Page-interleaved streams (RFC 3533 grouping): per-serial
    continuation buffers must reassemble each stream's packets exactly
    as a per-stream parse — including packets continued across pages
    that have a sibling's page spliced between them."""
    from enterprise_warp_spark.pipeline.vorbis import ogg_demux

    a = encode_vorbis(_sig(1800), 16000)
    b = encode_vorbis(np.clip(_sig(1300) * 0.7, -1, 1), 16000)
    sa, sb = 0x01020304, 0x0A0B0C0D
    pa, pb = _raw_pages(_with_serial(a, sa)), _raw_pages(_with_serial(b, sb))
    mux = bytearray()
    for i in range(max(len(pa), len(pb))):
        if i < len(pa):
            mux += pa[i]
        if i < len(pb):
            mux += pb[i]
    got: dict[int, list] = {}
    for serial, pkt, gran in ogg_demux(bytes(mux)):
        got.setdefault(serial, []).append((pkt, gran))
    assert set(got) == {sa, sb}
    assert got[sa] == list(ogg_pages_to_packets(a))
    assert got[sb] == list(ogg_pages_to_packets(b))
