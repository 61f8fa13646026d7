"""Parquet footer parsing — lakehouse-native metadata inspection (the
machinery behind row-group pruning, data skipping, and compaction
planning) implemented from scratch against the PUBLIC formats:

- the parquet file layout: `PAR1` magic at both ends, a 4-byte
  little-endian footer length before the trailing magic;
- Apache Thrift COMPACT PROTOCOL (the footer's wire format): ULEB128
  varints, zigzag signed ints, delta-encoded field IDs with a
  long-form escape, bool-in-field-header encoding, list headers with
  the size-15 escape, nested structs — plus generic skipping of field
  types we don't model (doubles, maps), which is what makes a Thrift
  reader survive schema evolution;
- the parquet FileMetaData schema: version / schema elements /
  num_rows / row groups -> column chunks -> ColumnMetaData (type,
  codec, num_values, statistics with little-endian min_value /
  max_value).

The oracled query writes a CONTROLLED file (pyarrow, fixed
row_group_size, sorted keys) so every footer fact — row-group count
and sizes, per-chunk types/codecs/value counts, and the int64
min/max statistics — is closed-form in SQL; the unit test also
differentials the reader against DuckDB's parquet_metadata() over
the driver-generated fixtures (a second, independent implementation).
"""

from __future__ import annotations

import struct

# thrift compact type ids
_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


def _varint(buf: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated thrift varint")
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
        if shift > 70:
            raise ValueError("thrift varint too long")


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_value(t: int, buf: bytes, pos: int):
    if t == _CT_TRUE:
        return True, pos
    if t == _CT_FALSE:
        return False, pos
    if t == _CT_BYTE:
        return struct.unpack_from("<b", buf, pos)[0], pos + 1
    if t in (_CT_I16, _CT_I32, _CT_I64):
        v, pos = _varint(buf, pos)
        return _zigzag(v), pos
    if t == _CT_DOUBLE:
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == _CT_BINARY:
        n, pos = _varint(buf, pos)
        if pos + n > len(buf):
            raise ValueError("truncated thrift binary")
        return buf[pos : pos + n], pos + n
    if t in (_CT_LIST, _CT_SET):
        hdr = buf[pos]
        pos += 1
        size = hdr >> 4
        etype = hdr & 0xF
        if size == 15:
            size, pos = _varint(buf, pos)
        out = []
        for _ in range(size):
            if etype in (_CT_TRUE, _CT_FALSE):  # bools are 1 byte in lists
                out.append(buf[pos] == 1)
                pos += 1
            else:
                v, pos = _read_value(etype, buf, pos)
                out.append(v)
        return out, pos
    if t == _CT_MAP:
        size, pos = _varint(buf, pos)
        if size == 0:
            return {}, pos
        kv = buf[pos]
        pos += 1
        kt, vt = kv >> 4, kv & 0xF
        out = {}
        for _ in range(size):
            k, pos = _read_value(kt, buf, pos)
            v, pos = _read_value(vt, buf, pos)
            out[k if not isinstance(k, bytes) else bytes(k)] = v
        return out, pos
    if t == _CT_STRUCT:
        return _read_struct(buf, pos)
    raise ValueError(f"unknown thrift compact type {t}")


def _read_struct(buf: bytes, pos: int) -> tuple[dict, int]:
    """Returns {field_id: value}; unknown fields are read (and kept)
    generically — the reader never needs the writer's exact IDL."""
    fields: dict[int, object] = {}
    last_fid = 0
    while True:
        if pos >= len(buf):
            raise ValueError("unterminated thrift struct")
        b = buf[pos]
        pos += 1
        if b == _CT_STOP:
            return fields, pos
        delta = b >> 4
        t = b & 0xF
        if delta:
            fid = last_fid + delta
        else:
            raw, pos = _varint(buf, pos)
            fid = _zigzag(raw)
        last_fid = fid
        v, pos = _read_value(t, buf, pos)
        fields[fid] = v
    # unreachable


_PARQUET_TYPES = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96", 4: "FLOAT",
    5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}
_PARQUET_CODECS = {
    0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO", 4: "BROTLI",
    5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW",
}


def parse_parquet_footer(payload: bytes) -> dict:
    """Full footer parse. Returns {version, num_rows, created_by,
    schema: [names], row_groups: [{num_rows, total_byte_size,
    columns: [{path, type, codec, num_values, stats_min, stats_max,
    data_page_offset, total_compressed_size}]}]}."""
    if payload[:4] != b"PAR1" or payload[-4:] != b"PAR1":
        raise ValueError("missing PAR1 magic")
    flen = struct.unpack_from("<I", payload, len(payload) - 8)[0]
    fstart = len(payload) - 8 - flen
    if fstart < 4:
        raise ValueError("footer length overruns the file")
    meta, _ = _read_struct(payload, fstart)

    def i64_stat(stats: dict | None, fid: int):
        # Statistics: 5 max_value, 6 min_value (little-endian plain)
        if not stats or fid not in stats:
            return None
        raw = stats[fid]
        if len(raw) != 8:
            return None
        return struct.unpack("<q", raw)[0]

    row_groups = []
    for rg in meta.get(4, []):
        cols = []
        for cc in rg.get(1, []):
            md = cc.get(3)
            if md is None:
                raise ValueError("column chunk without metadata")
            stats = md.get(12)
            cols.append(
                {
                    "path": ".".join(p.decode() for p in md.get(3, [])),
                    "type": _PARQUET_TYPES.get(md[1], f"?{md[1]}"),
                    "codec": _PARQUET_CODECS.get(md[4], f"?{md[4]}"),
                    "num_values": md[5],
                    "total_compressed_size": md.get(7),
                    "data_page_offset": md.get(9),
                    "stats_min": i64_stat(stats, 6),
                    "stats_max": i64_stat(stats, 5),
                }
            )
        row_groups.append(
            {
                "num_rows": rg[3],
                "total_byte_size": rg[2],
                "columns": cols,
            }
        )
    created = meta.get(6, b"")
    return {
        "version": meta.get(1),
        "num_rows": meta.get(3),
        "created_by": created.decode() if isinstance(created, bytes) else "",
        "schema": [
            se.get(4, b"").decode() for se in meta.get(2, [])[1:]  # skip root
        ],
        "row_groups": row_groups,
    }
