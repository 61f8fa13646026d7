"""TFRecord + tf.train.Example — THE classic ML training-data file
format, from scratch against the public specs (no tensorflow in this
container, and none needed):

- TFRecord framing: per record, a little-endian uint64 length, a
  MASKED CRC32C of the length bytes, the payload, and a masked CRC32C
  of the payload. CRC32C is the Castagnoli polynomial 0x1EDC6F41
  REFLECTED (software table implementation) and the mask is
  ((crc >> 15 | crc << 17) + 0xa282ead8) mod 2^32 — both checksums
  VERIFIED on read, so corruption is loud;
- protobuf WIRE FORMAT: varint tags (field_number << 3 | wire_type),
  wire types 0/1/2/5, nested length-delimited messages, and PACKED
  repeated scalars beside unpacked ones — a generic reader keyed by
  a schema map, which is how real parsers survive unknown fields
  (they skip by wire type);
- the tf.train.Example schema: Example.features(1) ->
  Features.feature(1) = map<string, Feature> (wire-encoded as a
  repeated entry message with key=1, value=2), Feature carrying one
  of bytes_list(1)/float_list(2)/int64_list(3), each with repeated
  value(1).

Splittable scan: TFRecord files are not natively splittable, so the
landing writer emits the standard OFFSET-INDEX sidecar (the layout
DALI/tfrecord readers use: one `offset length` pair per record) and
the Data Source plans record-range partitions from it — same design
as the CDX-WARC and central-directory-ZIP scans.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator

_CRC32C_TABLE = []


def _crc32c_table() -> list[int]:
    global _CRC32C_TABLE
    if not _CRC32C_TABLE:
        poly = 0x82F63B78  # reflected Castagnoli
        tab = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tab.append(c)
        _CRC32C_TABLE = tab
    return _CRC32C_TABLE


def crc32c(data: bytes) -> int:
    tab = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def write_tfrecord(payload: bytes) -> bytes:
    length = struct.pack("<Q", len(payload))
    return (
        length
        + struct.pack("<I", masked_crc(length))
        + payload
        + struct.pack("<I", masked_crc(payload))
    )


def read_tfrecords(blob: bytes) -> Iterator[bytes]:
    pos = 0
    while pos < len(blob):
        if pos + 12 > len(blob):
            raise ValueError("truncated TFRecord header")
        length = struct.unpack_from("<Q", blob, pos)[0]
        lcrc = struct.unpack_from("<I", blob, pos + 8)[0]
        if masked_crc(blob[pos : pos + 8]) != lcrc:
            raise ValueError(f"length CRC mismatch at byte {pos}")
        data_at = pos + 12
        if data_at + length + 4 > len(blob):
            raise ValueError("TFRecord payload overruns the file")
        data = blob[data_at : data_at + length]
        dcrc = struct.unpack_from("<I", blob, data_at + length)[0]
        if masked_crc(data) != dcrc:
            raise ValueError(f"data CRC mismatch at byte {pos}")
        yield data
        pos = data_at + length + 4


# ---- protobuf wire format -------------------------------------------


def _pb_varint(buf: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated protobuf varint")
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 70:
            raise ValueError("protobuf varint too long")


def pb_emit_tag(fnum: int, wtype: int) -> bytes:
    return pb_emit_varint((fnum << 3) | wtype)


def pb_emit_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def pb_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Generic wire walk: yields (field_number, wire_type, raw value).
    Unknown fields are decodable/skippable by construction."""
    pos = 0
    while pos < len(buf):
        tag, pos = _pb_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 0x7
        if wtype == 0:
            v, pos = _pb_varint(buf, pos)
        elif wtype == 1:
            v = buf[pos : pos + 8]
            pos += 8
        elif wtype == 2:
            n, pos = _pb_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError("length-delimited field overruns message")
            v = buf[pos : pos + n]
            pos += n
        elif wtype == 5:
            v = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, v


def parse_example(payload: bytes) -> dict:
    """tf.train.Example -> {name: list-of-values}, with float lists
    accepted PACKED or unpacked and int64 lists likewise."""
    features: dict[str, list] = {}
    ex = None
    for fnum, wtype, v in pb_fields(payload):
        if fnum == 1 and wtype == 2:
            ex = v
    if ex is None:
        raise ValueError("Example without a features field")
    for fnum, wtype, entry in pb_fields(ex):
        if fnum != 1 or wtype != 2:
            continue  # unknown fields in Features: skipped
        key = None
        feat = None
        for efn, ewt, ev in pb_fields(entry):
            if efn == 1:
                key = ev.decode("utf-8")
            elif efn == 2:
                feat = ev
        if key is None or feat is None:
            raise ValueError("map entry missing key or value")
        values: list = []
        for ffn, fwt, fv in pb_fields(feat):
            if ffn == 1:  # BytesList
                for lfn, lwt, lv in pb_fields(fv):
                    if lfn == 1:
                        values.append(bytes(lv))
            elif ffn == 2:  # FloatList
                for lfn, lwt, lv in pb_fields(fv):
                    if lfn != 1:
                        continue
                    if lwt == 2:  # packed
                        values.extend(
                            struct.unpack(f"<{len(lv) // 4}f", lv)
                        )
                    else:  # unpacked fixed32
                        values.append(struct.unpack("<f", lv)[0])
            elif ffn == 3:  # Int64List
                for lfn, lwt, lv in pb_fields(fv):
                    if lfn != 1:
                        continue
                    if lwt == 2:  # packed varints
                        p = 0
                        while p < len(lv):
                            x, p = _pb_varint(lv, p)
                            values.append(x - (1 << 64) if x >= 1 << 63 else x)
                    else:
                        values.append(lv - (1 << 64) if lv >= 1 << 63 else lv)
        features[key] = values
    return features


def _pb_len(fnum: int, body: bytes) -> bytes:
    return pb_emit_tag(fnum, 2) + pb_emit_varint(len(body)) + body


def build_example(doc_id: int, n_chars: int) -> bytes:
    """Deterministic tf.train.Example: 'id' int64 (UNPACKED varint),
    'label' int64 PACKED, 'emb' float list PACKED (exact halves
    (i + doc_id%10)/2), 'text' bytes 'doc {id}'."""
    ne = n_chars % 4 + 2
    emb = struct.pack(
        f"<{ne}f", *[(i + doc_id % 10) * 0.5 for i in range(ne)]
    )
    feats = b""
    feats += _pb_len(
        1,
        _pb_len(1, b"id")
        + _pb_len(2, _pb_len(3, pb_emit_tag(1, 0) + pb_emit_varint(doc_id))),
    )
    feats += _pb_len(
        1,
        _pb_len(1, b"label")
        + _pb_len(2, _pb_len(3, _pb_len(1, pb_emit_varint(doc_id % 7)))),
    )
    feats += _pb_len(
        1, _pb_len(1, b"emb") + _pb_len(2, _pb_len(2, _pb_len(1, emb)))
    )
    feats += _pb_len(
        1,
        _pb_len(1, b"text")
        + _pb_len(2, _pb_len(1, _pb_len(1, f"doc {doc_id}".encode()))),
    )
    return _pb_len(1, feats)


def write_tfrecord_landing(
    docs: list[tuple[int, int]], root: str, n_files: int = 8
) -> None:
    """One .tfrecord per doc_id%n_files bucket + the standard offset
    index sidecar (one 'offset length' line per record)."""
    os.makedirs(root, exist_ok=True)
    buckets: dict[int, list] = {i: [] for i in range(n_files)}
    for doc_id, n_chars in docs:
        buckets[doc_id % n_files].append((doc_id, n_chars))
    for i, members in buckets.items():
        blob = bytearray()
        index = []
        for doc_id, n_chars in sorted(members):
            rec = write_tfrecord(build_example(doc_id, n_chars))
            index.append((len(blob), len(rec)))
            blob += rec
        with open(os.path.join(root, f"part-{i:03d}.tfrecord"), "wb") as f:
            f.write(blob)
        with open(os.path.join(root, f"part-{i:03d}.tfrecord.idx"), "w") as f:
            for off, ln in index:
                f.write(f"{off} {ln}\n")


try:  # Python Data Source API (pyspark >= 4)
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    TFRECORD_SOURCE_SCHEMA = (
        "file STRING, rec_id BIGINT, label BIGINT, emb ARRAY<FLOAT>, "
        "text STRING"
    )

    class TfRecordReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]
            self.records_per_partition = int(
                options.get("records_per_partition", "1024")
            )

        def partitions(self):
            # plans from the index sidecars only (DALI-style layout);
            # indexless files degrade to one partition each
            parts = []
            for fn in sorted(os.listdir(self.path)):
                if not fn.endswith(".tfrecord"):
                    continue
                full = os.path.join(self.path, fn)
                idx = full + ".idx"
                if os.path.exists(idx):
                    with open(idx) as f:
                        rows = [tuple(map(int, ln.split())) for ln in f]
                    for lo in range(0, len(rows), self.records_per_partition):
                        chunk = rows[lo : lo + self.records_per_partition]
                        parts.append(
                            InputPartition(
                                (full, chunk[0][0], chunk[-1][0] + chunk[-1][1])
                            )
                        )
                else:
                    parts.append(InputPartition((full, 0, -1)))
            return parts

        def read(self, partition):
            full, lo, hi = partition.value
            with open(full, "rb") as f:
                f.seek(lo)
                blob = f.read() if hi < 0 else f.read(hi - lo)
            base = os.path.basename(full)
            for payload in read_tfrecords(blob):
                feats = parse_example(payload)
                yield (
                    base,
                    feats["id"][0],
                    feats["label"][0],
                    [float(x) for x in feats["emb"]],
                    feats["text"][0].decode("utf-8"),
                )

    class TfRecordDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "tfrecord"

        def schema(self) -> str:
            return TFRECORD_SOURCE_SCHEMA

        def reader(self, schema):
            return TfRecordReader(self.options)

    def register_tfrecord_source(spark) -> None:
        """Idempotently register the splittable TFRecord source."""
        try:
            spark.dataSource.register(TfRecordDataSource)
        except Exception:
            pass  # already registered in this session

except ImportError:  # pragma: no cover - pyspark<4 fallback
    pass
