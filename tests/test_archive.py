"""ZIP/TAR archive source (sources/archive.py) — canonical-module-built
fixtures (zipfile/tarfile ARE the canonical implementations), member
exactness, the zip-bomb guard, truncation tolerance, and the documents
bridge."""

import io
import tarfile
import zipfile

import pytest
from pyspark.sql import functions as F

from enterprise_warp_spark.sources.archive import (
    archive_documents,
    parse_archive_bytes,
    read_archive,
)

MEMBERS = {
    "docs/a.txt": b"alpha document",
    "docs/b.txt": b"beta " * 100,
    "data/c.bin": bytes(range(256)),
}


def _zip_bytes() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in MEMBERS.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _tar_bytes(compress: str = "") -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode=f"w:{compress}") as tf:
        for name, data in MEMBERS.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


@pytest.mark.parametrize(
    "payload",
    [_zip_bytes(), _tar_bytes(), _tar_bytes("gz"), _tar_bytes("bz2"),
     _tar_bytes("xz")],
    ids=["zip", "tar", "tgz", "tbz2", "txz"],
)
def test_members_extract_exactly(payload):
    rows = {r["member"]: r for r in parse_archive_bytes(payload, "x")}
    assert set(rows) == set(MEMBERS)
    for name, data in MEMBERS.items():
        assert rows[name]["payload"] == data
        assert rows[name]["size"] == len(data)
        assert rows[name]["archive_truncated"] is False


def test_member_pattern_filters_before_inflate():
    rows = parse_archive_bytes(_zip_bytes(), "x", member_pattern="docs/*.txt")
    assert {r["member"] for r in rows} == {"docs/a.txt", "docs/b.txt"}


def test_oversize_guard_skips_payload():
    rows = {
        r["member"]: r
        for r in parse_archive_bytes(_zip_bytes(), "x", max_member_bytes=100)
    }
    assert rows["docs/b.txt"]["oversize"] is True
    assert rows["docs/b.txt"]["payload"] is None
    assert rows["docs/b.txt"]["size"] == len(MEMBERS["docs/b.txt"])
    assert rows["docs/a.txt"]["oversize"] is False


def test_truncated_zip_recovers_leading_members():
    """Cut the central directory off: the tolerant local-header walk must
    still yield the complete leading members, flagged truncated."""
    z = _zip_bytes()
    cut = z[: z.find(b"PK\x01\x02")]  # drop central directory entirely
    rows = parse_archive_bytes(cut, "x")
    assert rows, "tolerant walk found nothing"
    assert all(r["archive_truncated"] for r in rows)
    got = {r["member"]: r["payload"] for r in rows if r["member"]}
    for name, data in got.items():
        assert data == MEMBERS[name]
    assert len(got) == len(MEMBERS)


def test_garbage_archive_emits_sentinel():
    rows = parse_archive_bytes(b"\x00" * 64, "x")
    assert len(rows) == 1
    assert rows[0]["member"] is None and rows[0]["archive_truncated"] is True


def test_spark_scan_and_documents_bridge(spark, tmp_path):
    (tmp_path / "one.zip").write_bytes(_zip_bytes())
    (tmp_path / "two.tar.gz").write_bytes(_tar_bytes("gz"))
    members = read_archive(spark, str(tmp_path / "*"), member_pattern="*.txt")
    rows = members.collect()
    assert len(rows) == 4  # 2 txt members per archive
    assert all(r.member.endswith(".txt") for r in rows)
    docs = archive_documents(members)
    out = docs.collect()
    assert len(out) == 4
    assert {r.text for r in out} == {"alpha document", "beta " * 100}
    # doc_id is the portable md5-60 of archive|member — replayable in SQL
    one = docs.filter(F.col("member") == "docs/a.txt").select(
        "doc_id", "source", "member"
    ).collect()
    import hashlib

    for r in one:
        want = int(
            hashlib.md5(f"{r.source}|{r.member}".encode()).hexdigest()[:15],
            16,
        )
        assert r.doc_id == want


def test_truncated_tar_yields_leading_members(spark):
    t = _tar_bytes()
    cut = t[: 512 + len(MEMBERS["docs/a.txt"]) + 100]  # mid-second-member
    rows = parse_archive_bytes(cut, "x")
    got = {r["member"] for r in rows if r["member"]}
    assert "docs/a.txt" in got
    assert all(r["archive_truncated"] for r in rows)


def test_truncated_zip_bomb_is_never_inflated():
    """A truncated archive carrying a deflate bomb whose header LIES about
    its size: the tolerant walk must hard-cap inflation and flag the
    member oversize rather than expanding it."""
    import struct as _struct
    import zlib

    bomb_plain = b"\x00" * (8 << 20)  # 8 MiB of zeros -> ~8 KiB deflated
    comp = zlib.compress(bomb_plain)[2:-4]  # raw deflate stream
    # local header declaring usize=100 (a lie), method 8
    hdr = b"PK\x03\x04" + _struct.pack(
        "<HHHHHIIIHH", 20, 0, 8, 0, 0, 0, len(comp), 100, len("b.bin"), 0
    )
    small = zlib.compress(b"ok data")[2:-4]
    hdr2 = b"PK\x03\x04" + _struct.pack(
        "<HHHHHIIIHH", 20, 0, 8, 0, 0, 0, len(small), 7, len("a.txt"), 0
    )
    data = hdr2 + b"a.txt" + small + hdr + b"b.bin" + comp  # no central dir
    rows = {
        r["member"]: r
        for r in parse_archive_bytes(data, "x", max_member_bytes=1 << 20)
    }
    assert rows["a.txt"]["payload"] == b"ok data"
    assert rows["b.bin"]["oversize"] is True
    assert rows["b.bin"]["payload"] is None
    assert all(r["archive_truncated"] for r in rows.values())


def test_streamed_entry_does_not_abort_walk():
    """A streamed (flag 0x08) entry mid-archive: members AFTER it must
    still be recovered by the tolerant walk (r11 walk aborted here)."""
    import struct as _struct
    import zlib

    small = zlib.compress(b"after data")[2:-4]
    streamed_body = b"\x01\x02\x03\x04"  # opaque; sizes 0 in header
    hdr_s = b"PK\x03\x04" + _struct.pack(
        "<HHHHHIIIHH", 20, 0x08, 8, 0, 0, 0, 0, 0, len("s.bin"), 0
    )
    hdr_a = b"PK\x03\x04" + _struct.pack(
        "<HHHHHIIIHH", 20, 0, 8, 0, 0, 0, len(small), 10, len("after.txt"), 0
    )
    data = hdr_s + b"s.bin" + streamed_body + hdr_a + b"after.txt" + small
    rows = {r["member"]: r for r in parse_archive_bytes(data, "x")}
    assert "after.txt" in rows
    assert rows["after.txt"]["payload"] == b"after data"
    assert all(r["archive_truncated"] for r in rows.values())


def test_resync_rejects_fabricated_member_in_streamed_body():
    """A streamed entry whose compressed body happens to CONTAIN a valid-
    looking local-header signature: the r12 walk emitted a garbage member
    from it; the validated re-sync must skip it (the byte after its fake
    body is not another PK frame) and still recover the real member."""
    import struct as _struct
    import zlib

    small = zlib.compress(b"after data")[2:-4]
    # fake stored member embedded in the streamed entry's opaque body —
    # plausible enough for the old walk to emit ("xyz", b"ABCD")
    fake = (
        b"PK\x03\x04"
        + _struct.pack("<HHHHHIIIHH", 20, 0, 0, 0, 0, 0, 4, 4, 3, 0)
        + b"xyz"
        + b"ABCD"
    )
    streamed_body = b"\x01\x02" + fake + b"GARBAGE NOISE"
    hdr_s = b"PK\x03\x04" + _struct.pack(
        "<HHHHHIIIHH", 20, 0x08, 8, 0, 0, 0, 0, 0, len("s.bin"), 0
    )
    hdr_a = b"PK\x03\x04" + _struct.pack(
        "<HHHHHIIIHH", 20, 0, 8, 0, 0, 0, len(small), 10, len("after.txt"), 0
    )
    data = hdr_s + b"s.bin" + streamed_body + hdr_a + b"after.txt" + small
    rows = {r["member"]: r for r in parse_archive_bytes(data, "x")}
    assert "xyz" not in rows  # the fabricated member is rejected
    assert rows["after.txt"]["payload"] == b"after data"


def _nested_tar_of_zips() -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for shard in ("shard0.zip", "shard1.zip"):
            z = _zip_bytes()
            info = tarfile.TarInfo(shard)
            info.size = len(z)
            tf.addfile(info, io.BytesIO(z))
        info = tarfile.TarInfo("plain.txt")
        info.size = 5
        tf.addfile(info, io.BytesIO(b"plain"))
    return buf.getvalue()


def test_nested_tar_of_zips_expands_with_composed_paths():
    rows = {
        r["member"]: r
        for r in parse_archive_bytes(_nested_tar_of_zips(), "x", recurse=1)
    }
    want = {
        f"{shard}!{m}"
        for shard in ("shard0.zip", "shard1.zip")
        for m in MEMBERS
    } | {"plain.txt"}
    assert set(rows) == want
    for name, data in MEMBERS.items():
        assert rows[f"shard0.zip!{name}"]["payload"] == data
    assert rows["plain.txt"]["payload"] == b"plain"
    assert not any(r["archive_truncated"] for r in rows.values())


def test_nested_default_stays_opaque_and_pattern_sees_composed_paths():
    # recurse=0 (default): the container members come through opaque
    flat = {r["member"] for r in parse_archive_bytes(_nested_tar_of_zips(), "x")}
    assert flat == {"shard0.zip", "shard1.zip", "plain.txt"}
    # member_pattern matches the COMPOSED path
    rows = parse_archive_bytes(
        _nested_tar_of_zips(), "x", member_pattern="*!docs/*.txt", recurse=1
    )
    got = {r["member"] for r in rows}
    assert got == {
        f"{s}!docs/{n}.txt"
        for s in ("shard0.zip", "shard1.zip")
        for n in ("a", "b")
    }


def test_nested_bomb_cap_applies_inside():
    """Cap sized to ADMIT the (well-compressed) inner zip container but
    trip on its declared-5000-byte member: the guard must compose through
    the recursion, not just gate the outer walk."""
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("big.txt", b"x" * 5000)
        zf.writestr("ok.txt", b"fine")
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w") as tf:
        info = tarfile.TarInfo("inner.zip")
        info.size = len(zbuf.getvalue())
        tf.addfile(info, io.BytesIO(zbuf.getvalue()))
    rows = {
        r["member"]: r
        for r in parse_archive_bytes(
            tbuf.getvalue(), "x", max_member_bytes=2000, recurse=1
        )
    }
    assert rows["inner.zip!big.txt"]["oversize"] is True
    assert rows["inner.zip!big.txt"]["payload"] is None
    assert rows["inner.zip!ok.txt"]["payload"] == b"fine"


def test_read_archive_recurse_end_to_end(spark, tmp_path):
    (tmp_path / "dump.tar").write_bytes(_nested_tar_of_zips())
    members = read_archive(
        spark, str(tmp_path / "*"), member_pattern="*!docs/a.txt", recurse=1
    )
    rows = members.collect()
    assert {r.member for r in rows} == {
        "shard0.zip!docs/a.txt", "shard1.zip!docs/a.txt"
    }
    assert all(bytes(r.payload) == MEMBERS["docs/a.txt"] for r in rows)


def test_nested_inner_truncation_flag_propagates():
    """A zip member that is itself a TRUNCATED zip: its recoverable inner
    members surface with archive_truncated=True while siblings from the
    intact outer stay clean."""
    z = _zip_bytes()
    cut = z[: z.find(b"PK\x01\x02")]  # inner zip loses its central dir
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("broken.zip")
        info.size = len(cut)
        tf.addfile(info, io.BytesIO(cut))
        info = tarfile.TarInfo("fine.txt")
        info.size = 4
        tf.addfile(info, io.BytesIO(b"fine"))
    rows = {
        r["member"]: r
        for r in parse_archive_bytes(buf.getvalue(), "x", recurse=1)
    }
    inner = [m for m in rows if m.startswith("broken.zip!")]
    assert len(inner) == len(MEMBERS)
    assert all(rows[m]["archive_truncated"] for m in inner)
    assert rows["fine.txt"]["archive_truncated"] is False
    assert rows["broken.zip!docs/a.txt"]["payload"] == MEMBERS["docs/a.txt"]


def test_zip_of_tars_expands_too():
    """The opposite nesting (zip containing tars) goes through the same
    recursion."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("inner.tar", _tar_bytes())
        zf.writestr("plain.bin", b"\x01\x02")
    rows = {
        r["member"]: r
        for r in parse_archive_bytes(buf.getvalue(), "x", recurse=1)
    }
    assert {f"inner.tar!{m}" for m in MEMBERS} <= set(rows)
    assert rows["inner.tar!data/c.bin"]["payload"] == MEMBERS["data/c.bin"]
    assert rows["plain.bin"]["payload"] == b"\x01\x02"
