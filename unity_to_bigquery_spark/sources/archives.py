"""ZIP landing-zone extraction — dataset dumps and bulk exports ship
as .zip at least as often as .tar.gz; this is the stdlib-``zipfile``
member walk over opaque binary payloads, the same Arrow-batched
pattern as every media kernel (payload dies in the executor, only
per-member stats/text reach the shuffle).

Reference scope: the reference ingests gzip'd NDJSON exports from a
landing zone (SURVEY §2A A4-A5, `sources/landing.py`); real Unity-
style exports also arrive zipped, so the archive walk completes the
container matrix. CRC-32 verification comes free from ``zipfile`` —
a member read that survives IS checksum-verified, so the stats oracle
doubles as an integrity check on both methods (STORED and DEFLATED
members are planted alternately).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def zip_members(payload: bytes) -> list[dict]:
    """REAL zip walk: central-directory listing via stdlib zipfile,
    every member read fully (CRC-32 verified by the library — a
    corrupted member raises BadZipFile, honest failure). Returns one
    dict per member: name, method ('stored'/'deflated'), n_bytes,
    data."""
    out = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for info in zf.infolist():
            data = zf.read(info.filename)  # CRC-checked by zipfile
            out.append(
                {
                    "name": info.filename,
                    "method": "stored"
                    if info.compress_type == zipfile.ZIP_STORED
                    else "deflated",
                    "n_bytes": len(data),
                    "data": data,
                }
            )
    return out


def synthesize_zip(doc_id: int, n_chars: int) -> bytes:
    """Deterministic .zip: ``M = n_chars%4 + 2`` members named
    ``doc/<doc_id>/<m>.bin``; member ``m`` carries the byte ramp
    ``v(i) = (23*doc_id + 11*m + i) % 256`` of length
    ``L_m = n_chars%150 + 40 + 5*m``, STORED for even m and DEFLATED
    for odd (both decode paths on every archive). Timestamps pinned
    for bit-determinism."""
    nm = n_chars % 4 + 2
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for m in range(nm):
            a = (23 * doc_id + 11 * m) % 256
            length = n_chars % 150 + 40 + 5 * m
            data = bytes((a + i) % 256 for i in range(length))
            info = zipfile.ZipInfo(
                f"doc/{doc_id}/{m}.bin", date_time=(2020, 1, 1, 0, 0, 0)
            )
            info.compress_type = (
                zipfile.ZIP_STORED if m % 2 == 0 else zipfile.ZIP_DEFLATED
            )
            zf.writestr(info, data)
    return buf.getvalue()


def synthesize_zip_media(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars) -> (doc_id, payload): .zip archives."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        synthesize_zip(int(d), int(c))
                        for d, c in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, "doc_id BIGINT, payload BINARY"
    )


ZIP_STATS_SCHEMA = (
    "doc_id BIGINT, n_members INT, n_deflated INT, name_len_sum BIGINT, "
    "total_bytes BIGINT, byte_sum BIGINT, first_b INT, last_b INT"
)


def zip_extract_stats(media: DataFrame) -> DataFrame:
    """REAL zip-extraction stats: member walk + CRC-verified reads per
    archive, reduced to integer-exact aggregates a SQL oracle
    re-derives from the fixture closed forms."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split()[0] for f in ZIP_STATS_SCHEMA.split(", ")]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                members = zip_members(bytes(payload))
                datas = [m["data"] for m in members]
                rows.append(
                    (
                        int(doc_id),
                        len(members),
                        sum(1 for m in members if m["method"] == "deflated"),
                        sum(len(m["name"]) for m in members),
                        sum(len(d) for d in datas),
                        sum(sum(d) for d in datas),
                        datas[0][0] if datas and datas[0] else -1,
                        datas[-1][-1] if datas and datas[-1] else -1,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, ZIP_STATS_SCHEMA)


# ---- tar.gz ------------------------------------------------------------
#
# The tar reader is a MANUAL 512-byte-block header walk (octal field
# parse, ustar magic, HEADER CHECKSUM verification, 512-padding) —
# while the writer delegates to stdlib tarfile, so the two sides are
# independent implementations: files any external tool writes parse
# here, and a reader bug cannot mirror a writer bug. The archive is
# one gzip stream around the whole tar (the .tar.gz layout), the
# deliberate contrast to WARC's member-per-record framing.


def tar_members(payload: bytes) -> list[dict]:
    """REAL tar walk: gunzip if magic'd, then 512-block headers —
    name (NUL-trimmed), size (octal), typeflag, ustar magic check,
    and the spec checksum (header bytes with the chksum field
    blanked, summed, compared octal). Regular files only; the
    two-zero-block terminator ends the walk."""
    import zlib

    if payload[:2] == b"\x1f\x8b":
        payload = zlib.decompress(payload, 16 + zlib.MAX_WBITS)
    out = []
    pos = 0
    while pos + 512 <= len(payload):
        hdr = payload[pos : pos + 512]
        if hdr == b"\x00" * 512:
            break
        if hdr[257:262] != b"ustar":
            raise ValueError(f"bad tar magic {hdr[257:263]!r} at {pos}")
        stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        if sum(blanked) != stored:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        name = hdr[:100].split(b"\x00")[0].decode("utf-8")
        size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
        typeflag = hdr[156:157]
        pos += 512
        data = payload[pos : pos + size]
        if len(data) != size:
            raise ValueError(f"tar member {name!r} short: {len(data)} < {size}")
        pos += (size + 511) // 512 * 512
        if typeflag in (b"0", b"\x00"):
            out.append({"name": name, "n_bytes": size, "data": data})
    return out


def synthesize_targz(doc_id: int, n_chars: int) -> bytes:
    """Deterministic .tar.gz via STDLIB tarfile (the independent
    writer): ``M = n_chars%3 + 2`` members ``data/<doc_id>/<m>.txt``
    carrying the ramp ``v(i) = (29*doc_id + 13*m + i) % 256`` of
    length ``L_m = n_chars%120 + 30 + 9*m``; uid/gid/mtime pinned,
    whole tar in ONE pinned gzip stream."""
    import io
    import tarfile
    import zlib

    nm = n_chars % 3 + 2
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for m in range(nm):
            a = (29 * doc_id + 13 * m) % 256
            length = n_chars % 120 + 30 + 9 * m
            data = bytes((a + i) % 256 for i in range(length))
            info = tarfile.TarInfo(f"data/{doc_id}/{m}.txt")
            info.size = length
            info.mtime = 0
            info.uid = info.gid = 0
            tf.addfile(info, io.BytesIO(data))
    c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    raw = c.compress(buf.getvalue()) + c.flush()
    return raw[:4] + b"\x00\x00\x00\x00" + raw[8:]  # pin MTIME


def synthesize_targz_media(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars) -> (doc_id, payload): .tar.gz archives."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        synthesize_targz(int(d), int(c))
                        for d, c in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, "doc_id BIGINT, payload BINARY"
    )


TAR_STATS_SCHEMA = (
    "doc_id BIGINT, n_members INT, name_len_sum BIGINT, "
    "total_bytes BIGINT, byte_sum BIGINT, first_b INT, last_b INT"
)


def tar_extract_stats(media: DataFrame) -> DataFrame:
    """REAL tar.gz extraction stats: gunzip + checksum-verified header
    walk per archive, reduced to integer-exact aggregates."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split()[0] for f in TAR_STATS_SCHEMA.split(", ")]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                members = tar_members(bytes(payload))
                datas = [m["data"] for m in members]
                rows.append(
                    (
                        int(doc_id),
                        len(members),
                        sum(len(m["name"]) for m in members),
                        sum(len(d) for d in datas),
                        sum(sum(d) for d in datas),
                        datas[0][0] if datas and datas[0] else -1,
                        datas[-1][-1] if datas and datas[-1] else -1,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, TAR_STATS_SCHEMA)


# ---- splittable ZIP data source (Python Data Source API) ----
#
# ZIP carries its own index: the END-OF-CENTRAL-DIRECTORY record at
# the file tail locates the central directory, and each CD entry
# locates its member's local header. That makes a .zip splittable the
# same way a CDX-indexed WARC is — the planner reads ONLY the tail
# (EOCD + CD, a few KB), never archive bytes, and hands executors
# member ranges to seek into. The reader re-implements the PKWARE
# APPNOTE layout from scratch (EOCD PK\x05\x06, CD entries PK\x01\x02,
# local headers PK\x03\x04) and VERIFIES, per member: local-header
# signature and name against the CD entry, CRC-32 of the inflated
# bytes, and the uncompressed size. STORED and DEFLATED both decode
# (zlib wbits=-15 for raw deflate).

import json
import os
import struct
import zlib


def read_zip_directory(path: str) -> list[dict]:
    """Driver-side planning read: EOCD + central directory ONLY.
    Returns one dict per member: name, method, comp_size, uncomp_size,
    crc32, local header offset."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        tail_len = min(size, 65536 + 22)
        f.seek(size - tail_len)
        tail = f.read(tail_len)
        eocd_at = tail.rfind(b"PK\x05\x06")
        if eocd_at < 0:
            raise ValueError(f"{path}: no end-of-central-directory record")
        (
            _disk, _cd_disk, _n_disk, n_total, cd_size, cd_off, _clen
        ) = struct.unpack_from("<HHHHIIH", tail, eocd_at + 4)
        f.seek(cd_off)
        cd = f.read(cd_size)
    entries = []
    pos = 0
    for _ in range(n_total):
        if cd[pos : pos + 4] != b"PK\x01\x02":
            raise ValueError(f"{path}: malformed central-directory entry")
        (
            _ver_made, _ver_need, _flags, method, _t, _d, crc,
            comp_size, uncomp_size, name_len, extra_len, comment_len,
            _disk_no, _iattr, _eattr, lho,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", cd, pos + 4)
        name = cd[pos + 46 : pos + 46 + name_len].decode("utf-8")
        entries.append(
            {
                "name": name,
                "method": method,
                "comp_size": comp_size,
                "uncomp_size": uncomp_size,
                "crc32": crc,
                "offset": lho,
            }
        )
        pos += 46 + name_len + extra_len + comment_len
    if len(entries) != n_total:
        raise ValueError(f"{path}: central directory truncated")
    return entries


def read_zip_member(f, entry: dict) -> bytes:
    """Executor-side member read: seek to the local header, verify it
    against the CD entry, inflate, verify CRC-32 and size."""
    f.seek(entry["offset"])
    hdr = f.read(30)
    if hdr[:4] != b"PK\x03\x04":
        raise ValueError(
            f"member {entry['name']}: CD offset does not hit a local header"
        )
    name_len, extra_len = struct.unpack_from("<HH", hdr, 26)
    name = f.read(name_len).decode("utf-8")
    if name != entry["name"]:
        raise ValueError(
            f"local header name {name!r} disagrees with CD {entry['name']!r}"
        )
    f.seek(extra_len, 1)
    raw = f.read(entry["comp_size"])
    if entry["method"] == 0:
        data = raw
    elif entry["method"] == 8:
        data = zlib.decompress(raw, -15)
    else:
        raise ValueError(f"unsupported compression method {entry['method']}")
    if len(data) != entry["uncomp_size"]:
        raise ValueError(f"member {entry['name']}: size mismatch after inflate")
    if zlib.crc32(data) & 0xFFFFFFFF != entry["crc32"]:
        raise ValueError(f"member {entry['name']}: CRC-32 mismatch")
    return data


def write_zip_landing(
    docs: list[tuple[int, int]], root: str, n_files: int = 8
) -> None:
    """Deterministic landing zone: each doc's members (the
    synthesize_zip fixture grid) are written into ``doc_id % n_files``
    archives — one multi-doc .zip per bucket, members named
    ``doc/<doc_id>/<m>.bin``."""
    os.makedirs(root, exist_ok=True)
    buckets: dict[int, list] = {i: [] for i in range(n_files)}
    for doc_id, n_chars in docs:
        buckets[doc_id % n_files].append((doc_id, n_chars))
    for i, members in buckets.items():
        path = os.path.join(root, f"part-{i:03d}.zip")
        with zipfile.ZipFile(path, "w") as zf:
            for doc_id, n_chars in sorted(members):
                nm = n_chars % 4 + 2
                for m in range(nm):
                    a = (23 * doc_id + 11 * m) % 256
                    length = n_chars % 150 + 40 + 5 * m
                    data = bytes((a + j) % 256 for j in range(length))
                    info = zipfile.ZipInfo(
                        f"doc/{doc_id}/{m}.bin", date_time=(2020, 1, 1, 0, 0, 0)
                    )
                    info.compress_type = (
                        zipfile.ZIP_STORED if m % 2 == 0 else zipfile.ZIP_DEFLATED
                    )
                    zf.writestr(info, data)


try:  # Python Data Source API (pyspark >= 4)
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    ZIP_SOURCE_SCHEMA = (
        "file STRING, name STRING, method STRING, n_bytes BIGINT, body BINARY"
    )

    class ZipReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]
            self.members_per_partition = int(
                options.get("members_per_partition", "256")
            )

        def partitions(self):
            # planning touches the EOCD + central directory only —
            # entry tuples ride inside the partition values, so
            # executors read exactly their member byte ranges
            parts = []
            for fn in sorted(os.listdir(self.path)):
                if not fn.endswith(".zip"):
                    continue
                full = os.path.join(self.path, fn)
                entries = read_zip_directory(full)
                for lo in range(0, len(entries), self.members_per_partition):
                    chunk = entries[lo : lo + self.members_per_partition]
                    parts.append(InputPartition((full, json.dumps(chunk))))
            return parts

        def read(self, partition):
            full, chunk_json = partition.value
            base = os.path.basename(full)
            with open(full, "rb") as f:
                for entry in json.loads(chunk_json):
                    data = read_zip_member(f, entry)
                    yield (
                        base,
                        entry["name"],
                        "stored" if entry["method"] == 0 else "deflated",
                        len(data),
                        data,
                    )

    class ZipDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "zipindex"

        def schema(self) -> str:
            return ZIP_SOURCE_SCHEMA

        def reader(self, schema):
            return ZipReader(self.options)

    def register_zip_source(spark) -> None:
        """Idempotently register the splittable ZIP source."""
        try:
            spark.dataSource.register(ZipDataSource)
        except Exception:
            pass  # already registered in this session

except ImportError:  # pragma: no cover - pyspark<4 fallback
    pass
