"""PDF reader semantics: xref header verification, indirect /Length,
stream/endstream agreement, object-syntax strictness, and content-
stream text interpretation — the behaviors the closed-form oracle
depends on, exercised directly."""

import re
import zlib

import pytest

from unity_to_bigquery_spark.llm.pdf import (
    PdfDocument,
    _ObjReader,
    extract_page_text,
    extract_pdf,
    write_pdf,
)


def test_object_reader_types():
    r = _ObjReader(b"<< /A 1 /B [ 2 3.5 (s) /N ] /C 7 0 R /D true >>")
    d = r.read()
    assert d["/A"] == 1 and d["/B"][1] == 3.5 and d["/B"][2] == b"s"
    assert d["/B"][3] == "/N" and d["/C"].num == 7 and d["/D"] is True
    # literal-string escapes: parens, backslash, octal, nesting
    assert _ObjReader(rb"(a\(b\)c\\d\101 (nested))").read() == b"a(b)c\\dA (nested)"
    # hex string with odd final digit padded per spec
    assert _ObjReader(b"<48 6\n96>").read() == b"Hi`"
    with pytest.raises(ValueError, match="unterminated"):
        _ObjReader(b"(never closed").read()
    with pytest.raises(ValueError, match="unterminated"):
        _ObjReader(b"<< /A 1").read()
    with pytest.raises(ValueError, match="key is not a name"):
        _ObjReader(b"<< 1 2 >>").read()


def test_xref_verification_and_stream_traps():
    raw = write_pdf(5, 100)
    assert extract_pdf(raw)["n_pages"] == 3

    # a shifted xref entry (stale table) is an error, not a misread
    bad = bytearray(raw)
    x = raw.rfind(b"\nxref\n") + 1
    entry = re.search(rb"(\d{10}) 00000 n", raw[x:])
    off = int(entry.group(1))
    bad[x + entry.start() : x + entry.start() + 10] = b"%010d" % (off + 2)
    with pytest.raises(ValueError, match="xref entry"):
        extract_pdf(bytes(bad))

    # stream /Length disagreeing with endstream is an error: shrink the
    # inline /Length of a raw (non-Flate) stream
    m = re.search(rb"/Length (\d\d+) >>", raw)  # inline length, page>0
    bad2 = raw[: m.start(1)] + b"%d" % (int(m.group(1)) - 4) + raw[m.end(1) :]
    # (xref offsets after this point shift; rebuild is overkill — the
    # length edit keeps byte count identical only when same width)
    if len(bad2) == len(raw):
        with pytest.raises(ValueError, match="endstream|xref"):
            extract_pdf(bad2)

    # unsupported filter is loud
    doc = PdfDocument(raw)
    (sd, _) = doc.get_object(6)
    assert sd["/Filter"] == "/FlateDecode"
    body = doc.get_stream(6)
    assert body.startswith(b"BT")

    with pytest.raises(ValueError, match="missing %PDF"):
        extract_pdf(b"not a pdf")
    with pytest.raises(ValueError, match="startxref"):
        extract_pdf(b"%PDF-1.4\njunk")


def test_indirect_length_resolution():
    # page 0's /Length is an indirect reference by construction
    raw = write_pdf(1, 100)
    doc = PdfDocument(raw)
    (sd, _) = doc.get_object(6)
    assert hasattr(sd["/Length"], "num")
    inner = doc.get_stream(6)
    assert inner == zlib.decompress(
        raw[raw.find(b"stream\n", 0) + 7 :][: doc.resolve(sd["/Length"])[0]]
    )


def test_content_stream_interpreter():
    # Td breaks lines; TJ kerning numbers are skipped; hex shows decode
    text, shows = extract_page_text(
        b"BT /F1 12 Tf 0 -14 Td (ab) Tj 0 -14 Td [ (c) -250 (d) ] TJ "
        b"0 -14 Td <6566> Tj ET"
    )
    assert text == "ab\ncd\nef" and shows == 3
    # text outside BT/ET is ignored
    text, shows = extract_page_text(b"(zzz) Tj BT (a) Tj ET")
    assert text == "a" and shows == 1
    with pytest.raises(ValueError, match="Tj without"):
        extract_page_text(b"BT Tj ET")
    with pytest.raises(ValueError, match="TJ without"):
        extract_page_text(b"BT TJ ET")


def test_fixture_grid_matches_closed_form():
    for d in range(10):
        for c in (48, 100, 251, 553):
            m = extract_pdf(write_pdf(d, c))
            np_ = d % 3 + 1
            nt = c % 4 + 2
            vchars = sum(
                1 + len(str((23 * d + 7 * pg + t) % 100))
                for pg in range(np_)
                for t in range(nt)
            )
            assert m["n_text_chars"] == vchars + np_ * (nt + 7) + np_ - 1 + 3
            assert m["n_words"] == np_ * (nt + 2)
            assert m["n_objects"] == 4 + 3 * np_
            assert m["producer"] == f"Synth {d}"
