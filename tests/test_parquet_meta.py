"""Thrift compact-protocol reader semantics: differential against
DuckDB's parquet_metadata() on the real driver fixtures (a second,
independent implementation), controlled-write closed forms, and
wire-format edge cases (long-form field IDs, size-15 lists, unknown
fields, bool-in-header)."""

import io

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from unity_to_bigquery_spark.plans.parquet_meta import (
    _read_struct,
    _varint,
    _zigzag,
    parse_parquet_footer,
)


def test_differential_vs_duckdb_on_fixtures():
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "documents", "lineitem"):
        path = f"/root/testdata/sf0.001/{t}.parquet"
        m = parse_parquet_footer(open(path, "rb").read())
        ref = con.execute(
            "SELECT row_group_id, path_in_schema, type, num_values,"
            " row_group_num_rows, compression"
            " FROM parquet_metadata(?) ORDER BY row_group_id, column_id",
            [path],
        ).fetchall()
        ours = [
            (ri, c["path"], c["type"], c["num_values"], rg["num_rows"], c["codec"])
            for ri, rg in enumerate(m["row_groups"])
            for c in rg["columns"]
        ]
        assert len(ours) == len(ref)
        for a, b in zip(ours, ref):
            assert a[:5] == tuple(b[:5]), (t, a, b)
            assert a[5].upper() == b[5].upper(), (t, a, b)
        assert m["num_rows"] == sum(rg["num_rows"] for rg in m["row_groups"])
        assert m["created_by"]  # real writers stamp themselves


def test_controlled_write_closed_forms():
    tbl = pa.table(
        {
            "k": pa.array(range(300), pa.int64()),
            "s": pa.array([f"x{i % 5}" for i in range(300)]),
        }
    )
    buf = io.BytesIO()
    pq.write_table(tbl, buf, row_group_size=128, compression="gzip")
    m = parse_parquet_footer(buf.getvalue())
    assert [rg["num_rows"] for rg in m["row_groups"]] == [128, 128, 44]
    assert m["schema"] == ["k", "s"]
    for r, rg in enumerate(m["row_groups"]):
        k = rg["columns"][0]
        assert (k["type"], k["codec"]) == ("INT64", "GZIP")
        assert k["stats_min"] == 128 * r
        assert k["stats_max"] == min(128 * r + 127, 299)
        assert rg["columns"][1]["type"] == "BYTE_ARRAY"


def test_thrift_wire_edges():
    # varint / zigzag
    assert _varint(b"\xac\x02", 0) == (300, 2)
    assert _zigzag(300) == 150 and _zigzag(299) == -150
    # short-form delta field id, i32 zigzag value: field 1 = 7
    assert _read_struct(b"\x15\x0e\x00", 0)[0] == {1: 7}
    # LONG-FORM field id (delta 0 + zigzag id 100)
    assert _read_struct(b"\x05\xc8\x01\x0e\x00", 0)[0] == {100: 7}
    # bool encoded in the field-type nibble; ids are DELTA-encoded
    assert _read_struct(b"\x11\x22\x00", 0)[0] == {1: True, 3: False}
    # list with size-15 escape: 16 byte elements
    body = b"\x19" + b"\xf3\x10" + bytes(range(16)) + b"\x00"
    fields, _ = _read_struct(body, 0)
    assert fields[1] == list(range(16))
    # unknown field types (double) are read generically, not fatal
    fields, _ = _read_struct(b"\x17" + b"\x00" * 8 + b"\x00", 0)
    assert fields[1] == 0.0
    with pytest.raises(ValueError, match="unterminated"):
        _read_struct(b"\x15\x0e", 0)
    with pytest.raises(ValueError, match="PAR1"):
        parse_parquet_footer(b"PAR1xxxxnotafooter")
