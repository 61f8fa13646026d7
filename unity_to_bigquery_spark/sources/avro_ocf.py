"""Avro Object Container Files — the remaining big-data interchange
format, from scratch against the public Avro 1.x spec, and the one
that demonstrates INDEX-FREE SPLITTING: unlike the CDX-WARC /
central-directory-ZIP / offset-index-TFRecord scans, an Avro file is
splittable from RAW BYTE RANGES because every block ends with the
file's 16-byte SYNC MARKER — a reader dropped at an arbitrary offset
scans forward to the next sync and is guaranteed to be at a block
boundary (the Hadoop input-split mechanism).

Implemented wire pieces:
- header: `Obj\\x01`, the file-metadata MAP (avro.schema JSON,
  avro.codec) in Avro map encoding (zigzag-varint block counts,
  length-prefixed strings, zero terminator), then the sync marker;
- data blocks: record count (long), byte size (long), serialized
  records, sync — the size field is VERIFIED against the actual
  encoding and the sync against the header's;
- binary encoding for the fixture schema: long (zigzag varint),
  double (8-byte LE), string (length-prefixed UTF-8), array<string>
  (block count + items + 0 terminator);
- split ownership: a block belongs to the byte range containing its
  first post-sync byte, so every block is read exactly once across
  arbitrary range partitions.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

_SYNC = bytes(
    [0xF7, 0x1C, 0x83, 0x5A, 0x9E, 0x21, 0x44, 0xB0,
     0x6D, 0x02, 0xE8, 0x57, 0x3F, 0xCA, 0x19, 0x76]
)

_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "label", "type": "long"},
        {"name": "score", "type": "double"},
        {"name": "text", "type": "string"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
    ],
}


def _zz_encode(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_decode(buf: bytes, pos: int) -> tuple[int, int]:
    u = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated avro varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return (u >> 1) ^ -(u & 1), pos
        shift += 7
        if shift > 70:
            raise ValueError("avro varint too long")


def _enc_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _zz_encode(len(raw)) + raw


def _dec_string(buf: bytes, pos: int) -> tuple[str, int]:
    n, pos = _zz_decode(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("bad avro string length")
    return buf[pos : pos + n].decode("utf-8"), pos + n


def encode_record(doc_id: int, n_chars: int) -> bytes:
    """Fixture record: id, label=id%5, score=(id%100)*0.25 (exact
    quarters), text='avro {id}', tags ['t0'..] of n_chars%3+1."""
    nt = n_chars % 3 + 1
    out = _zz_encode(doc_id)
    out += _zz_encode(doc_id % 5)
    out += struct.pack("<d", (doc_id % 100) * 0.25)
    out += _enc_string(f"avro {doc_id}")
    out += _zz_encode(nt)
    for j in range(nt):
        out += _enc_string(f"t{j}")
    out += _zz_encode(0)  # array terminator
    return bytes(out)


def decode_record(buf: bytes, pos: int) -> tuple[dict, int]:
    rid, pos = _zz_decode(buf, pos)
    label, pos = _zz_decode(buf, pos)
    score = struct.unpack_from("<d", buf, pos)[0]
    pos += 8
    text, pos = _dec_string(buf, pos)
    tags: list[str] = []
    while True:
        n, pos = _zz_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # negative count form: abs(count) preceded by size
            _size, pos = _zz_decode(buf, pos)
            n = -n
        for _ in range(n):
            t, pos = _dec_string(buf, pos)
            tags.append(t)
    return {"id": rid, "label": label, "score": score, "text": text,
            "tags": tags}, pos


def _enc_meta_map(meta: dict[str, bytes]) -> bytes:
    out = _zz_encode(len(meta))
    for k, v in meta.items():
        out += _enc_string(k) + _zz_encode(len(v)) + v
    out += _zz_encode(0)
    return bytes(out)


def write_avro_ocf(records: list[bytes], block_records: int = 25) -> bytes:
    meta = {
        "avro.schema": json.dumps(_SCHEMA).encode(),
        "avro.codec": b"null",
    }
    out = bytearray(b"Obj\x01" + _enc_meta_map(meta) + _SYNC)
    for lo in range(0, len(records), block_records):
        chunk = records[lo : lo + block_records]
        body = b"".join(chunk)
        out += _zz_encode(len(chunk)) + _zz_encode(len(body)) + body + _SYNC
    return bytes(out)


def read_avro_header(blob: bytes) -> tuple[dict, bytes, int]:
    """Returns (metadata map, sync marker, first block offset)."""
    if blob[:4] != b"Obj\x01":
        raise ValueError("missing Avro OCF magic")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _zz_decode(blob, pos)
        if n == 0:
            break
        if n < 0:
            _size, pos = _zz_decode(blob, pos)
            n = -n
        for _ in range(n):
            k, pos = _dec_string(blob, pos)
            vlen, pos = _zz_decode(blob, pos)
            meta[k] = blob[pos : pos + vlen]
            pos += vlen
    sync = blob[pos : pos + 16]
    if len(sync) != 16:
        raise ValueError("truncated header sync marker")
    return meta, sync, pos + 16


def read_blocks(blob: bytes, sync: bytes, lo: int, hi: int, first: int):
    """Yield records from every block whose first byte lies in
    [lo, hi): seek to lo, resynchronize on the sync marker (or start
    at `first` when lo precedes it), verify each block's size field
    and trailing sync."""
    if lo <= first:
        pos = first
    else:
        found = blob.find(sync, lo - 16)
        if found < 0:
            return
        pos = found + 16
    while pos < hi and pos < len(blob):
        count, p = _zz_decode(blob, pos)
        size, p = _zz_decode(blob, p)
        body = blob[p : p + size]
        if len(body) != size:
            raise ValueError("avro block overruns the file")
        if blob[p + size : p + size + 16] != sync:
            raise ValueError(f"missing sync after block at byte {pos}")
        rp = 0
        for _ in range(count):
            rec, rp = decode_record(body, rp)
            yield rec
        if rp != size:
            raise ValueError("block size field disagrees with its records")
        pos = p + size + 16


def write_avro_landing(
    docs: list[tuple[int, int]], root: str, n_files: int = 8
) -> None:
    os.makedirs(root, exist_ok=True)
    buckets: dict[int, list] = {i: [] for i in range(n_files)}
    for doc_id, n_chars in docs:
        buckets[doc_id % n_files].append((doc_id, n_chars))
    for i, members in buckets.items():
        recs = [encode_record(d, c) for d, c in sorted(members)]
        with open(os.path.join(root, f"part-{i:03d}.avro"), "wb") as f:
            f.write(write_avro_ocf(recs))


try:  # Python Data Source API (pyspark >= 4)
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    AVRO_SOURCE_SCHEMA = (
        "file STRING, rec_id BIGINT, label BIGINT, score DOUBLE, "
        "text STRING, n_tags INT"
    )

    class AvroOcfReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]
            self.split_bytes = int(options.get("split_bytes", "1048576"))

        def partitions(self):
            # INDEX-FREE planning: raw byte ranges from the file size
            # alone — no sidecar, no directory read; executors
            # resynchronize on the sync marker
            parts = []
            for fn in sorted(os.listdir(self.path)):
                if not fn.endswith(".avro"):
                    continue
                full = os.path.join(self.path, fn)
                size = os.path.getsize(full)
                for lo in range(0, size, self.split_bytes):
                    parts.append(
                        InputPartition((full, lo, min(lo + self.split_bytes, size)))
                    )
            return parts

        def read(self, partition):
            full, lo, hi = partition.value
            with open(full, "rb") as f:
                blob = f.read()
            meta, sync, first = read_avro_header(blob)
            base = os.path.basename(full)
            for rec in read_blocks(blob, sync, lo, hi, first):
                yield (
                    base, rec["id"], rec["label"], rec["score"],
                    rec["text"], len(rec["tags"]),
                )

    class AvroOcfDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "avro_ocf"

        def schema(self) -> str:
            return AVRO_SOURCE_SCHEMA

        def reader(self, schema):
            return AvroOcfReader(self.options)

    def register_avro_source(spark) -> None:
        """Idempotently register the sync-splittable Avro source."""
        try:
            spark.dataSource.register(AvroOcfDataSource)
        except Exception:
            pass  # already registered in this session

except ImportError:  # pragma: no cover - pyspark<4 fallback
    pass
