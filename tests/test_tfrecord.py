"""TFRecord + protobuf wire semantics: CRC32C public vectors, masked
framing corruption, packed/unpacked list parity, unknown-field
skipping, and split-scan correctness."""

import struct

import pytest

from unity_to_bigquery_spark.sources.tfrecord import (
    build_example,
    crc32c,
    masked_crc,
    parse_example,
    pb_emit_tag,
    pb_emit_varint,
    read_tfrecords,
    write_tfrecord,
    write_tfrecord_landing,
)


def test_crc32c_public_vectors():
    # RFC 3720 / published Castagnoli check values
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    # masking is the documented rotation + constant
    c = crc32c(b"abc")
    assert masked_crc(b"abc") == ((((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def test_framing_and_corruption():
    blob = write_tfrecord(b"a") + write_tfrecord(b"bc") + write_tfrecord(b"")
    assert [bytes(x) for x in read_tfrecords(blob)] == [b"a", b"bc", b""]
    # flip one payload byte -> data CRC trips
    bad = bytearray(blob)
    bad[12] ^= 0x20
    with pytest.raises(ValueError, match="data CRC"):
        list(read_tfrecords(bytes(bad)))
    # flip a length byte -> length CRC trips
    bad2 = bytearray(blob)
    bad2[0] ^= 0x01
    with pytest.raises(ValueError, match="length CRC"):
        list(read_tfrecords(bytes(bad2)))
    with pytest.raises(ValueError, match="truncated|overruns"):
        list(read_tfrecords(blob[:-3]))


def test_example_wire_format():
    f = parse_example(build_example(9, 101))
    assert f["id"] == [9] and f["label"] == [2]
    assert f["emb"] == [(i + 9) * 0.5 for i in range(101 % 4 + 2)]
    assert f["text"] == [b"doc 9"]

    # unknown fields (any wire type) are skipped, not fatal: append a
    # varint field 99 and a fixed64 field 98 inside Features
    ex = build_example(3, 77)
    # rebuild: Example { features(1) = <feats + unknown fields> }
    from unity_to_bigquery_spark.sources.tfrecord import _pb_len, pb_fields

    feats = next(v for f_, w, v in pb_fields(ex) if f_ == 1)
    extra = pb_emit_tag(99, 0) + pb_emit_varint(12345)
    extra += pb_emit_tag(98, 1) + struct.pack("<q", -1)
    ex2 = _pb_len(1, feats + extra)
    assert parse_example(ex2)["id"] == [3]

    # varint int64 negative round trip (two's complement 10-byte form)
    neg = _pb_len(
        1,
        _pb_len(
            1,
            _pb_len(1, b"n")
            + _pb_len(2, _pb_len(3, pb_emit_tag(1, 0) + pb_emit_varint((1 << 64) - 5))),
        ),
    )
    assert parse_example(neg)["n"] == [-5]


def test_split_scan_equals_unsplit(spark, tmp_path):
    from unity_to_bigquery_spark.sources.tfrecord import (
        TfRecordReader,
        register_tfrecord_source,
    )

    pairs = [(i, 40 + i * 7) for i in range(50)]
    root = str(tmp_path / "landing")
    write_tfrecord_landing(pairs, root, n_files=4)
    register_tfrecord_source(spark)

    reader = TfRecordReader({"path": root, "records_per_partition": "5"})
    assert len(reader.partitions()) > 4

    def load(rpp):
        return (
            spark.read.format("tfrecord")
            .option("path", root)
            .option("records_per_partition", str(rpp))
            .load()
        )

    key = lambda r: (r.file, r.rec_id, r.label, tuple(r.emb), r.text)
    split = sorted(key(r) for r in load(5).collect())
    whole = sorted(key(r) for r in load(10000).collect())
    assert split == whole and len(split) == 50
