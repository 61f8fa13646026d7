"""PDF text extraction — the other half of document-pipeline step
zero (llm/html.py covers web pages; PDFs dominate scanned/published
corpora). From-scratch against the public ISO 32000 file format,
stdlib only (zlib for FlateDecode):

- trailer discovery from EOF (`startxref` → byte offset), classic
  cross-reference TABLE parse (20-byte `nnnnnnnnnn ggggg n` entries),
  and every in-use entry VERIFIED against the `N 0 obj` header it
  points at (the idx1-style cross-check: a stale or shifted xref is an
  error, not a silent misread);
- a recursive-descent object reader for the 8 PDF object types:
  dictionaries, arrays, names, numbers, literal strings with escape
  sequences (\\( \\) \\\\ \\ooo), hex strings, booleans/null, and
  indirect references `N 0 R`;
- the document graph walked by reference: /Root → /Pages → /Kids →
  per-page /Contents, with /Length resolved through an indirect
  reference (a real-world trap — many writers emit stream lengths as
  separate objects);
- stream decoding: /Filter /FlateDecode via zlib, or raw when absent;
- a content-stream text interpreter: BT/ET blocks, Td/TD line moves
  (new line ⇒ newline in extracted text), Tf font selects, Tj literal
  shows, and TJ array shows with kerning numbers skipped.

Spark-side the extractor is ONE mapInPandas stage; only fixed-width
stats and short strings cross the Arrow boundary.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_OBJ_HEADER = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Ref({self.num})"


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _ObjReader:
    """Recursive-descent reader for PDF object syntax."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _skip_ws(self) -> None:
        b = self.buf
        while self.pos < len(b):
            c = b[self.pos : self.pos + 1]
            if c in (b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "):
                self.pos += 1
            elif c == b"%":  # comment to EOL
                nl = b.find(b"\n", self.pos)
                self.pos = len(b) if nl < 0 else nl + 1
            else:
                return

    def read(self):
        self._skip_ws()
        b, p = self.buf, self.pos
        if p >= len(b):
            raise ValueError("unexpected end of PDF object data")
        c = b[p : p + 1]
        if b.startswith(b"<<", p):
            return self._read_dict()
        if c == b"<":
            return self._read_hex_string()
        if c == b"(":
            return self._read_literal_string()
        if c == b"[":
            return self._read_array()
        if c == b"/":
            return self._read_name()
        if b.startswith(b"true", p):
            self.pos = p + 4
            return True
        if b.startswith(b"false", p):
            self.pos = p + 5
            return False
        if b.startswith(b"null", p):
            self.pos = p + 4
            return None
        return self._read_number_or_ref()

    def _read_name(self) -> str:
        b = self.buf
        p = self.pos + 1
        q = p
        while q < len(b) and b[q : q + 1] not in _WS_OR_DELIM:
            q += 1
        self.pos = q
        return "/" + b[p:q].decode("latin-1")

    def _read_number_or_ref(self):
        b = self.buf
        m = re.match(rb"[+-]?\d*\.?\d+", b[self.pos :])
        if not m:
            raise ValueError(
                f"malformed PDF object at byte {self.pos}: {b[self.pos:self.pos+16]!r}"
            )
        tok = m.group(0)
        self.pos += len(tok)
        if b"." in tok:
            return float(tok)
        # lookahead for `gen R` making this an indirect reference
        save = self.pos
        self._skip_ws()
        m2 = re.match(rb"(\d+)\s+R\b", b[self.pos :])
        if m2 and b"." not in tok:
            self.pos += m2.end()
            return _Ref(int(tok))
        self.pos = save
        return int(tok)

    def _read_array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.pos >= len(self.buf):
                raise ValueError("unterminated PDF array")
            if self.buf[self.pos : self.pos + 1] == b"]":
                self.pos += 1
                return out
            out.append(self.read())

    def _read_dict(self) -> dict:
        self.pos += 2
        out: dict[str, object] = {}
        while True:
            self._skip_ws()
            if self.buf.startswith(b">>", self.pos):
                self.pos += 2
                return out
            if self.pos >= len(self.buf):
                raise ValueError("unterminated PDF dictionary")
            key = self.read()
            if not isinstance(key, str) or not key.startswith("/"):
                raise ValueError(f"PDF dict key is not a name: {key!r}")
            out[key] = self.read()

    def _read_hex_string(self) -> bytes:
        b = self.buf
        close = b.find(b">", self.pos + 1)
        if close < 0:
            raise ValueError("unterminated hex string")
        digits = re.sub(rb"\s", b"", b[self.pos + 1 : close])
        self.pos = close + 1
        if len(digits) % 2:
            digits += b"0"  # spec: odd final digit padded with 0
        return bytes.fromhex(digits.decode("ascii"))

    def _read_literal_string(self) -> bytes:
        b = self.buf
        p = self.pos + 1
        out = bytearray()
        depth = 1
        while p < len(b):
            c = b[p]
            if c == 0x5C:  # backslash
                p += 1
                if p >= len(b):
                    break
                e = b[p : p + 1]
                simple = {
                    b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
                    b"(": 40, b")": 41, b"\\": 92,
                }
                if e in simple:
                    out.append(simple[e])
                    p += 1
                elif e.isdigit():
                    o = b[p : p + 3]
                    o = re.match(rb"[0-7]{1,3}", o).group(0)
                    out.append(int(o, 8) & 0xFF)
                    p += len(o)
                else:  # line continuation or unknown escape: drop \
                    p += 1
            elif c == 0x28:  # (
                depth += 1
                out.append(c)
                p += 1
            elif c == 0x29:  # )
                depth -= 1
                if depth == 0:
                    self.pos = p + 1
                    return bytes(out)
                out.append(c)
                p += 1
            else:
                out.append(c)
                p += 1
        raise ValueError("unterminated literal string")


_WS_OR_DELIM = frozenset(
    bytes([x]) for x in _WS + _DELIM
)


def _parse_xref(buf: bytes, start: int) -> tuple[dict[int, int], dict]:
    """Parse a classic xref table at `start`; returns ({obj: offset}
    for in-use entries, trailer dict)."""
    if not buf.startswith(b"xref", start):
        raise ValueError("startxref does not point at an xref table")
    pos = buf.find(b"\n", start) + 1
    offsets: dict[int, int] = {}
    while not buf.startswith(b"trailer", pos):
        m = re.match(rb"(\d+)\s+(\d+)\s*\n", buf[pos:])
        if not m:
            raise ValueError("malformed xref subsection header")
        first, count = int(m.group(1)), int(m.group(2))
        pos += m.end()
        for i in range(count):
            entry = buf[pos : pos + 20]
            em = re.match(rb"(\d{10}) (\d{5}) ([nf])", entry)
            if not em:
                raise ValueError(f"malformed xref entry: {entry!r}")
            if em.group(3) == b"n":
                offsets[first + i] = int(em.group(1))
            pos += 20
    pos += len(b"trailer")
    trailer = _ObjReader(buf, pos).read()
    if not isinstance(trailer, dict):
        raise ValueError("trailer is not a dictionary")
    return offsets, trailer


class PdfDocument:
    """Minimal classic-xref PDF reader with header-verified offsets."""

    def __init__(self, buf: bytes):
        if not buf.startswith(b"%PDF-"):
            raise ValueError("missing %PDF header")
        tail = buf[-256:]
        sx = tail.rfind(b"startxref")
        if sx < 0:
            raise ValueError("missing startxref")
        m = re.search(rb"startxref\s+(\d+)", tail[sx:])
        if not m:
            raise ValueError("malformed startxref")
        self.buf = buf
        self.offsets, self.trailer = _parse_xref(buf, int(m.group(1)))
        # verify every in-use xref entry against the object header it
        # points at — a shifted/stale table is an error, not a misread
        for num, off in self.offsets.items():
            if num == 0:
                continue
            hm = _OBJ_HEADER.match(buf, off)
            if not hm or int(hm.group(1)) != num:
                raise ValueError(
                    f"xref entry for object {num} points at "
                    f"{buf[off:off+16]!r}, not its header"
                )

    def resolve(self, v):
        return self.get_object(v.num) if isinstance(v, _Ref) else v

    def get_object(self, num: int):
        off = self.offsets.get(num)
        if off is None:
            raise ValueError(f"object {num} not in xref")
        hm = _OBJ_HEADER.match(self.buf, off)
        r = _ObjReader(self.buf, hm.end())
        return r.read(), r.pos

    def get_stream(self, num: int) -> bytes:
        (d, pos) = self.get_object(num)
        if not isinstance(d, dict):
            raise ValueError(f"object {num} is not a stream dictionary")
        m = re.compile(rb"stream\r?\n").search(self.buf, pos)
        if not m:
            raise ValueError(f"object {num} has no stream keyword")
        length = self.resolve(d.get("/Length"))
        if isinstance(length, tuple):
            length = length[0]
        if not isinstance(length, int):
            raise ValueError(f"object {num} /Length is not an integer")
        raw = self.buf[m.end() : m.end() + length]
        if self.buf.find(b"endstream", m.end() + length, m.end() + length + 4 + len(b"endstream")) < 0:
            raise ValueError(f"object {num} stream length disagrees with endstream")
        filt = d.get("/Filter")
        if filt == "/FlateDecode":
            return zlib.decompress(raw)
        if filt is None:
            return raw
        raise ValueError(f"unsupported stream filter {filt}")

    # -- document graph ------------------------------------------------
    def _deref_dict(self, v) -> dict:
        v = self.resolve(v)
        if isinstance(v, tuple):
            v = v[0]
        if not isinstance(v, dict):
            raise ValueError("expected a dictionary object")
        return v

    def pages(self) -> list[dict]:
        root = self._deref_dict(self.trailer["/Root"])
        tree = self._deref_dict(root["/Pages"])
        out: list[dict] = []

        def walk(node: dict) -> None:
            if node.get("/Type") == "/Pages":
                for kid in node["/Kids"]:
                    walk(self._deref_dict(kid))
            elif node.get("/Type") == "/Page":
                out.append(node)
            else:
                raise ValueError(f"unexpected page-tree node {node.get('/Type')}")

        walk(tree)
        count = self.resolve(tree.get("/Count"))
        if count != len(out):
            raise ValueError("/Count disagrees with the walked page tree")
        return out

    def info(self) -> dict:
        ref = self.trailer.get("/Info")
        return self._deref_dict(ref) if ref is not None else {}


_TOKEN = re.compile(
    rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>|\[|\]|/[^\s()<>\[\]{}/%]*"
    rb"|[+-]?\d*\.?\d+|[A-Za-z'\"*]+"
)


def extract_page_text(content: bytes) -> tuple[str, int]:
    """Interpret a content stream's text operators. Returns (text,
    n_show_ops): lines split on Td/TD moves, Tj/TJ shows concatenated
    within a line; TJ kerning numbers are positioning, not text."""
    lines: list[list[bytes]] = []
    cur: list[bytes] = []
    stack: list[object] = []
    in_text = False
    shows = 0

    def literal(tok: bytes) -> bytes:
        r = _ObjReader(tok)
        return r.read()

    for m in _TOKEN.finditer(content):
        tok = m.group(0)
        c = tok[:1]
        if c in b"(<[" or c == b"]" or c == b"/" or c.isdigit() or c in b"+-":
            if tok == b"[":
                stack.append("[")
            elif tok == b"]":
                arr = []
                while stack and stack[-1] != "[":
                    arr.append(stack.pop())
                if not stack:
                    raise ValueError("unbalanced TJ array")
                stack.pop()
                arr.reverse()
                stack.append(arr)
            elif c in b"(<":
                stack.append(literal(tok))
            elif c == b"/":
                stack.append(tok.decode("latin-1"))
            else:
                stack.append(float(tok) if b"." in tok else int(tok))
            continue
        op = tok
        if op == b"BT":
            in_text = True
            stack.clear()
        elif op == b"ET":
            in_text = False
            stack.clear()
        elif not in_text:
            stack.clear()
        elif op in (b"Td", b"TD"):
            if cur:
                lines.append(cur)
                cur = []
            stack.clear()
        elif op == b"Tj":
            if not stack or not isinstance(stack[-1], bytes):
                raise ValueError("Tj without a string operand")
            cur.append(stack.pop())
            shows += 1
            stack.clear()
        elif op == b"TJ":
            if not stack or not isinstance(stack[-1], list):
                raise ValueError("TJ without an array operand")
            for el in stack.pop():
                if isinstance(el, bytes):
                    cur.append(el)
            shows += 1
            stack.clear()
        else:  # Tf, Tm, etc: consume operands
            stack.clear()
    if cur:
        lines.append(cur)
    text = "\n".join(b"".join(parts).decode("latin-1") for parts in lines)
    return text, shows


def extract_pdf(payload: bytes) -> dict:
    """Full extraction: xref-verified object walk, page tree, per-page
    content streams (Flate or raw), text interpretation."""
    doc = PdfDocument(payload)
    pages = doc.pages()
    texts: list[str] = []
    shows = 0
    n_flate = 0
    width = height = 0
    for pg in pages:
        ref = pg["/Contents"]
        if not isinstance(ref, _Ref):
            raise ValueError("/Contents must be an indirect reference")
        (sd, _) = doc.get_object(ref.num)
        if sd.get("/Filter") == "/FlateDecode":
            n_flate += 1
        t, s = extract_page_text(doc.get_stream(ref.num))
        texts.append(t)
        shows += s
        box = doc.resolve(pg["/MediaBox"])
        width, height = int(box[2]), int(box[3])
    text = "\n".join(texts)
    info = doc.info()
    producer = info.get("/Producer", b"")
    words = text.split()
    return {
        "n_pages": len(pages),
        "n_objects": len([k for k in doc.offsets if k != 0]),
        "n_text_chars": len(text),
        "n_words": len(words),
        "first_word": words[0] if words else "",
        "n_show_ops": shows,
        "n_flate_streams": n_flate,
        "page_w": width,
        "page_h": height,
        "producer": producer.decode("latin-1") if isinstance(producer, bytes) else str(producer),
    }


# ---- deterministic-but-real writer --------------------------------------


def write_pdf(doc_id: int, n_chars: int) -> bytes:
    """Real classic-xref PDF: np = doc_id%3+1 pages; page pg carries
    nt = n_chars%4+2 Tj lines 'v{(23*id+7*pg+t)%100}' (page 0 line 0
    suffixed with the escape trap '\\(x\\)'), one TJ array line
    'k{pg}' + kern + 'q{id%10}', and one hex-string line 'h{pg}'.
    Page 0's /Length is an INDIRECT reference; every page but the
    last is FlateDecode-compressed; trailer /Info carries /Producer
    'Synth {id}'. Offsets in the xref table are exact."""
    np_ = doc_id % 3 + 1
    nt = n_chars % 4 + 2

    objects: dict[int, bytes] = {}
    # object numbering: 1 catalog, 2 pages, 3 info, 4 font,
    # per page pg: 5+3*pg page, 6+3*pg contents, 7+3*pg length holder
    kid_refs = " ".join(f"{5 + 3 * pg} 0 R" for pg in range(np_))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (
        f"<< /Type /Pages /Kids [ {kid_refs} ] /Count {np_} >>".encode()
    )
    objects[3] = f"<< /Producer (Synth {doc_id}) >>".encode()
    objects[4] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for pg in range(np_):
        ops = [b"BT", b"/F1 12 Tf"]
        for t in range(nt):
            s = f"v{(23 * doc_id + 7 * pg + t) % 100}"
            if pg == 0 and t == 0:
                s += r"\(x\)"
            ops.append(b"0 -14 Td")
            ops.append(b"(" + s.encode() + b") Tj")
        ops.append(b"0 -14 Td")
        ops.append(
            f"[ (k{pg}) -250 (q{doc_id % 10}) ] TJ".encode()
        )
        ops.append(b"0 -14 Td")
        ops.append(b"<" + f"h{pg}".encode().hex().encode() + b"> Tj")
        ops.append(b"ET")
        content = b"\n".join(ops)
        use_flate = pg < np_ - 1
        data = zlib.compress(content) if use_flate else content
        filt = b"/Filter /FlateDecode " if use_flate else b""
        if pg == 0:
            # indirect /Length (the separate-length-object trap)
            objects[7 + 3 * pg] = str(len(data)).encode()
            ldecl = f"/Length {7 + 3 * pg} 0 R".encode()
        else:
            objects[7 + 3 * pg] = b"null"
            ldecl = f"/Length {len(data)}".encode()
        objects[6 + 3 * pg] = (
            b"<< " + ldecl + b" " + filt + b">>\nstream\n" + data + b"\nendstream"
        )
        objects[5 + 3 * pg] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [ 0 0 612 792 ] "
            f"/Resources << /Font << /F1 4 0 R >> >> "
            f"/Contents {6 + 3 * pg} 0 R >>".encode()
        )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objects) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R /Info 3 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


PDF_MEDIA_SCHEMA = "doc_id BIGINT, fmt STRING, payload BINARY"

PDF_STATS_SCHEMA = (
    "doc_id BIGINT, fmt STRING, n_pages INT, n_objects INT, "
    "n_text_chars BIGINT, n_words BIGINT, first_word STRING, "
    "n_show_ops INT, n_flate_streams INT, page_w INT, page_h INT, "
    "producer STRING"
)


def synthesize_pdf_media(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars) -> (doc_id, fmt, payload): real PDF files."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": "pdf",
                    "payload": [
                        write_pdf(int(d), int(c))
                        for d, c in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(batches, PDF_MEDIA_SCHEMA)


def pdf_extract_stats(media: DataFrame) -> DataFrame:
    """xref walk + object graph + Flate + text ops in ONE mapInPandas
    stage; only stats cross the Arrow boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split()[0] for f in PDF_STATS_SCHEMA.split(", ")]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = extract_pdf(bytes(payload))
                rows.append(
                    (
                        int(doc_id), "pdf", m["n_pages"], m["n_objects"],
                        m["n_text_chars"], m["n_words"], m["first_word"],
                        m["n_show_ops"], m["n_flate_streams"], m["page_w"],
                        m["page_h"], m["producer"],
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, PDF_STATS_SCHEMA)
