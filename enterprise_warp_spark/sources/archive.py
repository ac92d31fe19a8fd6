"""ZIP / TAR archive source: member-level ingestion of bundled document
dumps (arXiv source tarballs, code zips, dataset shards are shipped as
archives at corpus scale). No counterpart in the reference (it has no
archive sources); this is training-data-pipeline extension surface feeding
the documents schema, the sibling of sources/warc.py.

Containers: ZIP (via the canonical ``zipfile``), TAR and compressed TAR
(``tarfile`` mode 'r:*' auto-detects gz/bz2/xz members), detected by magic
bytes per file. Like WARC, archives are not block-splittable, so
parallelism is per-FILE: ``binaryFile`` scan -> Arrow-batched
``mapInPandas`` extractor -> one row per member; nothing touches the
driver.

Robustness contract (data is hostile at 100 TB):
  * decompression-bomb guard: members whose DECLARED uncompressed size
    exceeds ``max_member_bytes`` are emitted with a NULL payload and
    ``oversize=true`` instead of being inflated;
  * truncated/corrupt archives yield every member that fully parses, with
    ``archive_truncated=true`` on the file's rows (a ZIP whose central
    directory is gone is re-walked from local-file headers); an archive
    yielding NO parseable member emits one NULL-member sentinel row so
    corrupt inputs stay countable — never an exception on data.
"""

from __future__ import annotations

import io
import struct
import tarfile
import zipfile
from fnmatch import fnmatch
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ARCHIVE_SCHEMA = (
    "archive string, member string, size long, payload binary, "
    "oversize boolean, archive_truncated boolean"
)


def _zip_members_tolerant(
    data: bytes, max_member_bytes: int
) -> Iterator[tuple[str, int, bytes | None]]:
    """Walk ZIP local-file headers directly (PK\\x03\\x04) for archives
    whose central directory is truncated away. Only stored (0) and
    deflated (8) members; a member that fails to inflate ends the walk.

    Bomb-safe: the DECLARED size gates inflation (payload None when it
    exceeds the cap), and inflation itself is hard-capped via
    decompressobj(max_length) so a header that LIES about its size still
    cannot expand past the cap — it comes back as an oversize row.

    A streamed entry (flag bit 0x08: sizes live in a trailing data
    descriptor we can't trust without the central directory) is skipped,
    NOT fatal: the walk advances past its header and re-synchronises on
    the next PK\\x03\\x04 signature, so fully-parseable members AFTER a
    streamed one are still recovered. Same for a corrupt deflate body.

    Re-sync candidates are VALIDATED before being emitted: the scan after
    a skipped entry runs through that entry's untrusted compressed body,
    where the 4 signature bytes can occur by chance (2^-32 per offset —
    near-certain somewhere in a multi-GB dump). A candidate is accepted
    only if its header is plausible (known method, sane name length, body
    in bounds) AND the byte right after its body is another PK frame or
    EOF — a chance match inside deflate output fails that alignment check
    and the scan keeps looking instead of fabricating a member row."""
    import zlib

    def _plausible(at: int) -> bool:
        if at + 30 > len(data):
            return False
        _v, fl, meth, _t2, _d2, _c, cs, _u, nl, xl = struct.unpack_from(
            "<HHHHHIIIHH", data, at + 4
        )
        if meth not in (0, 8) or nl == 0 or nl > 1024 or xl > 4096:
            return False
        body = at + 30 + nl + xl
        if fl & 0x08:  # a streamed header is a legitimate frame to
            return True  # re-sync ON (it gets skipped again below)
        end = body + cs
        if end > len(data):
            return False
        return end == len(data) or data[end : end + 2] == b"PK"

    pos = 0
    resyncing = False
    while True:
        pos = data.find(b"PK\x03\x04", pos)
        if pos < 0 or pos + 30 > len(data):
            return
        if resyncing and not _plausible(pos):
            pos += 1  # chance signature inside a skipped body: keep looking
            continue
        resyncing = False
        (
            _ver,
            flags,
            method,
            _t,
            _d,
            _crc,
            csize,
            usize,
            nlen,
            xlen,
        ) = struct.unpack_from("<HHHHHIIIHH", data, pos + 4)
        name = data[pos + 30 : pos + 30 + nlen].decode("utf-8", "replace")
        body_at = pos + 30 + nlen + xlen
        if flags & 0x08:  # streamed entry: local csize/usize are 0 lies;
            # skip its header and re-sync on the next signature (csize is
            # occasionally real even with 0x08 — use it as a hint when
            # sane so the scan doesn't re-match inside this entry's body)
            pos = body_at + csize if 0 < csize <= len(data) - body_at else body_at
            resyncing = True
            continue
        raw = data[body_at : body_at + csize]
        if len(raw) < csize:
            return
        if usize > max_member_bytes:
            yield name, usize, None  # declared oversize: never inflated
            pos = body_at + csize
            continue
        try:
            if method == 0:
                payload = raw
            elif method == 8:
                d = zlib.decompressobj(-15)
                payload = d.decompress(raw, max_member_bytes + 1)
                if len(payload) > max_member_bytes or d.unconsumed_tail:
                    # the header lied about usize: stop inflating, flag it
                    yield name, max(usize, len(payload)), None
                    pos = body_at + csize
                    continue
            else:
                pos = body_at + csize
                continue
        except zlib.error:
            pos = body_at + csize  # corrupt body: re-sync, keep walking
            resyncing = True
            continue
        yield name, usize, payload
        pos = body_at + csize


def _looks_like_archive(data: bytes) -> bool:
    """Magic-byte sniff for containers we can open: ZIP, tar (ustar at
    257), or gz/bz2/xz wrappers (tarfile 'r:*' auto-detects those)."""
    return (
        data[:4] == b"PK\x03\x04"
        or data[:2] == b"\x1f\x8b"
        or data[:3] == b"BZh"
        or data[:6] == b"\xfd7zXZ\x00"
        or (len(data) > 262 and data[257:262] == b"ustar")
    )


def parse_archive_bytes(
    data: bytes,
    path: str = "",
    member_pattern: str | None = None,
    max_member_bytes: int = 64 << 20,
    recurse: int = 0,
) -> list[dict]:
    """Parse one archive payload -> member row dicts (ARCHIVE_SCHEMA).

    ``recurse`` levels of NESTED archives (tar-of-zips, the common
    crawl-dump shape) are expanded in place: a member whose payload
    sniffs as a container is replaced by its inner members under the
    composed path ``outer.zip!inner.txt`` (the '!' convention of Hadoop
    har/jar URIs). All guards compose — the inner parse runs under the
    SAME max_member_bytes bomb cap, ``member_pattern`` matches the
    composed path, and an inner container that fails to parse falls back
    to its opaque member row rather than vanishing."""
    rows: list[dict] = []
    truncated = False

    def emit(name: str, size: int, payload: bytes | None, oversize: bool):
        if payload is not None and recurse > 0 and _looks_like_archive(payload):
            inner = parse_archive_bytes(
                payload, path, None, max_member_bytes, recurse - 1
            )
            real = [r for r in inner if r["member"] is not None]
            if real:
                for r in real:
                    composed = f"{name}!{r['member']}"
                    if member_pattern is not None and not fnmatch(
                        composed, member_pattern
                    ):
                        continue
                    rows.append(
                        dict(
                            archive=path,
                            member=composed,
                            size=r["size"],
                            payload=r["payload"],
                            oversize=r["oversize"],
                            # inner truncation survives; the outer flag is
                            # OR-ed in at the end
                            archive_truncated=r["archive_truncated"],
                        )
                    )
                return
            # sniffed like a container but yielded nothing: opaque member
        if member_pattern is not None and not fnmatch(name, member_pattern):
            return
        rows.append(
            dict(
                archive=path,
                member=name,
                size=int(size),
                payload=payload,
                oversize=oversize,
                archive_truncated=False,  # patched at the end
            )
        )

    def emit_entry(name: str, size: int, opener):
        if size > max_member_bytes:
            emit(name, size, None, True)
        else:
            emit(name, size, opener(), False)

    if data[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        try:
            with zipfile.ZipFile(io.BytesIO(data)) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    emit_entry(
                        info.filename,
                        info.file_size,
                        lambda i=info: zf.read(i),
                    )
        except zipfile.BadZipFile:
            truncated = True
            for name, usize, payload in _zip_members_tolerant(
                data, max_member_bytes
            ):
                if name.endswith("/"):
                    continue
                if payload is None:
                    emit(name, usize, None, True)
                else:
                    emit(name, usize, payload, False)
    else:
        try:
            with tarfile.open(
                fileobj=io.BytesIO(data), mode="r:*", ignore_zeros=True
            ) as tf:
                while True:
                    try:
                        info = tf.next()
                    except (tarfile.ReadError, EOFError, OSError):
                        truncated = True
                        break
                    if info is None:
                        break
                    if not info.isfile():
                        continue
                    emit_entry(
                        info.name,
                        info.size,
                        lambda i=info: tf.extractfile(i).read(),
                    )
        except (tarfile.ReadError, EOFError, OSError):
            truncated = True
    if not rows and truncated:
        rows.append(
            dict(
                archive=path,
                member=None,
                size=0,
                payload=None,
                oversize=False,
                archive_truncated=True,
            )
        )
    for r in rows:
        r["archive_truncated"] = bool(r["archive_truncated"] or truncated)
    return rows


def read_archive(
    spark: SparkSession,
    path_glob: str,
    member_pattern: str | None = None,
    max_member_bytes: int = 64 << 20,
    recurse: int = 0,
) -> DataFrame:
    """Scan archive files -> one row per member (ARCHIVE_SCHEMA).
    ``member_pattern`` is an fnmatch glob applied to member paths
    ('**/*.txt' style selection happens HERE so unselected members are
    never inflated or shipped). ``recurse`` expands nested archives that
    many levels deep (composed 'outer!inner' member paths)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path_glob).select(
        F.col("path").alias("archive"), F.col("content").alias("data")
    )

    def _parse(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [
            "archive", "member", "size", "payload", "oversize",
            "archive_truncated",
        ]
        for pdf in batches:
            out: list[dict] = []
            for _, row in pdf.iterrows():
                out.extend(
                    parse_archive_bytes(
                        bytes(row["data"]),
                        row["archive"],
                        member_pattern,
                        max_member_bytes,
                        recurse,
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(_parse, ARCHIVE_SCHEMA)


def archive_documents(members: DataFrame) -> DataFrame:
    """Member rows -> documents-schema-shaped rows: utf-8 text (lossy
    replace), doc_id = portable 60-bit md5 of archive|member (stable,
    engine-replayable), n_chars. Oversize/sentinel rows are excluded."""
    ok = members.filter(
        F.col("payload").isNotNull() & F.col("member").isNotNull()
    )
    text = F.decode(F.col("payload"), "UTF-8")
    key = "concat(archive, '|', member)"
    return ok.select(
        F.expr(
            f"cast(conv(substr(md5({key}), 1, 15), 16, 10) as bigint)"
        ).alias("doc_id"),
        F.col("archive").alias("source"),
        F.col("member"),
        text.alias("text"),
        F.length(text).alias("n_chars"),
    )
