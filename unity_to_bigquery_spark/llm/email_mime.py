"""EML / MIME parsing — email and forum archives are a major corpus
class, and their wire format stacks four public specs the pipeline
must unwind before any text operator sees a byte:

- RFC 5322 headers with FOLDING (continuation lines start with
  whitespace) unfolded before parsing;
- RFC 2047 encoded-words in headers: both the B (base64) and Q
  (quoted-printable-ish, `_` = space) forms, charset-tagged;
- RFC 2045 multipart bodies: boundary walk (`--b`, terminal `--b--`),
  per-part headers, Content-Transfer-Encoding;
- the two transfer decoders implemented from scratch: BASE64 (4->3
  with padding validation) and QUOTED-PRINTABLE (=XX escapes, soft
  line breaks `=\\r\\n`).

The stdlib `email` package exists and the unit test DIFFERENTIALS the
from-scratch parser against it; the oracled query hashes planted
fixtures end to end (subjects through both 2047 forms, QP escapes
including the =3D self-escape, base64 text + binary attachments).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_B64_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
)
_B64_INDEX = {c: i for i, c in enumerate(_B64_ALPHABET)}


def b64_encode(data: bytes) -> str:
    out = []
    for i in range(0, len(data), 3):
        chunk = data[i : i + 3]
        n = int.from_bytes(chunk.ljust(3, b"\x00"), "big")
        q = [(n >> 18) & 63, (n >> 12) & 63, (n >> 6) & 63, n & 63]
        enc = "".join(_B64_ALPHABET[x] for x in q)
        if len(chunk) == 1:
            enc = enc[:2] + "=="
        elif len(chunk) == 2:
            enc = enc[:3] + "="
        out.append(enc)
    return "".join(out)


def b64_decode(s: str) -> bytes:
    s = re.sub(r"\s", "", s)
    if len(s) % 4:
        raise ValueError("base64 length not a multiple of 4")
    out = bytearray()
    for i in range(0, len(s), 4):
        block = s[i : i + 4]
        pad = block.count("=")
        if pad and i + 4 != len(s):
            raise ValueError("base64 padding before the final block")
        if pad > 2 or "=" in block[: 4 - pad]:
            raise ValueError("malformed base64 padding")
        n = 0
        for c in block.replace("=", "A"):
            if c not in _B64_INDEX:
                raise ValueError(f"invalid base64 character {c!r}")
            n = (n << 6) | _B64_INDEX[c]
        out += n.to_bytes(3, "big")[: 3 - pad]
    return bytes(out)


def qp_decode(s: str) -> str:
    """Quoted-printable: =XX hex escapes, =\\r?\\n soft breaks."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c != "=":
            out.append(c)
            i += 1
            continue
        if s[i + 1 : i + 3] == "\r\n":
            i += 3  # soft break
        elif s[i + 1 : i + 2] == "\n":
            i += 2
        else:
            hx = s[i + 1 : i + 3]
            if len(hx) < 2 or not re.match(r"[0-9A-Fa-f]{2}$", hx):
                raise ValueError(f"malformed quoted-printable escape ={hx}")
            out.append(chr(int(hx, 16)))
            i += 3
    # =XX escapes are byte-valued: reinterpret latin-1 bytes as UTF-8
    return "".join(out).encode("latin-1").decode("utf-8")


_ENCODED_WORD = re.compile(r"=\?([^?]+)\?([BbQq])\?([^?]*)\?=")


def decode_header_value(v: str) -> str:
    """RFC 2047: decode every encoded-word; plain text passes through."""

    def repl(m: re.Match) -> str:
        charset, enc, payload = m.group(1).lower(), m.group(2).upper(), m.group(3)
        if enc == "B":
            raw = b64_decode(payload)
        else:
            raw = (
                qp_decode(payload.replace("_", " "))
                .encode("utf-8")
            )
        return raw.decode(charset)

    return _ENCODED_WORD.sub(repl, v)


def _split_headers(block: str) -> tuple[dict, str]:
    """Unfold + parse headers; returns ({lower-name: value}, body)."""
    if "\r\n\r\n" in block:
        head, body = block.split("\r\n\r\n", 1)
    else:
        head, body = block, ""
    unfolded: list[str] = []
    for line in head.split("\r\n"):
        if line[:1] in (" ", "\t") and unfolded:
            unfolded[-1] += " " + line.strip()
        else:
            unfolded.append(line)
    headers = {}
    for line in unfolded:
        if not line:
            continue
        if ":" not in line:
            raise ValueError(f"malformed header line {line!r}")
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return headers, body


def parse_eml(payload: str) -> dict:
    """Full parse: unfolded headers, 2047 subject, boundary walk,
    per-part transfer decoding."""
    headers, body = _split_headers(payload)
    subject = decode_header_value(headers.get("subject", ""))
    from_addr = headers.get("from", "")
    ctype = headers.get("content-type", "text/plain")
    m = re.search(r'boundary="?([^";]+)"?', ctype)
    if "multipart" in ctype and not m:
        raise ValueError("multipart message without a boundary parameter")

    text_chars = html_chars = attachment_bytes = 0
    n_parts = 0
    if m:
        boundary = m.group(1)
        chunks = body.split(f"--{boundary}")
        if not chunks[-1].strip().startswith("--"):
            raise ValueError("missing terminal boundary")
        for part in chunks[1:-1]:
            part = part.lstrip("\r\n")
            phead, pbody = _split_headers(part)
            n_parts += 1
            cte = phead.get("content-transfer-encoding", "7bit").lower()
            ptype = phead.get("content-type", "text/plain")
            pbody = pbody.rstrip("\r\n")
            if cte == "base64":
                raw = b64_decode(pbody)
                decoded = None
            elif cte == "quoted-printable":
                decoded = qp_decode(pbody)
                raw = None
            else:
                decoded, raw = pbody, None
            if ptype.startswith("text/plain"):
                text = decoded if decoded is not None else raw.decode("utf-8")
                text_chars += len(text.replace("\r\n", "\n"))
            elif ptype.startswith("text/html"):
                text = decoded if decoded is not None else raw.decode("utf-8")
                html_chars += len(text.replace("\r\n", "\n"))
            else:
                attachment_bytes += len(raw if raw is not None else decoded.encode())
    else:
        n_parts = 1
        text_chars = len(body.replace("\r\n", "\n"))
    return {
        "from_addr": from_addr,
        "subject": subject,
        "n_parts": n_parts,
        "text_chars": text_chars,
        "html_chars": html_chars,
        "attachment_bytes": attachment_bytes,
    }


def write_eml(doc_id: int, n_chars: int) -> str:
    """Deterministic-but-real EML: folded X-Trace header, subject via
    RFC 2047 B (odd doc_id: 'Sübject {d}') or Q (even: underscore
    spaces), multipart/mixed with a quoted-printable text part
    (=C3=A9 é, a soft break, the =3D self-escape), a base64 HTML
    part, and (even doc_id) a base64 binary attachment."""
    d = doc_id
    if d % 2:
        subj = "=?utf-8?B?" + b64_encode(f"Sübject {d}".encode()) + "?="
    else:
        subj = f"=?utf-8?Q?Subject_{d}?="
    plain_qp = f"caf=C3=A9 {d} line one=\r\nstill\r\nx=3Dy"
    html_raw = f"<p>html {d}</p>"
    att = bytes((d + i) % 256 for i in range(n_chars % 50 + 20))
    b = f"bnd{d}"
    lines = [
        f"From: user{d % 7}@host{d % 3}.example",
        "To: corpus@example.org",
        f"Subject: {subj}",
        "X-Trace: first-hop",
        " second-hop folded-continuation",  # folded header
        "MIME-Version: 1.0",
        f'Content-Type: multipart/mixed; boundary="{b}"',
        "",
        "preamble to ignore",
        f"--{b}",
        "Content-Type: text/plain; charset=utf-8",
        "Content-Transfer-Encoding: quoted-printable",
        "",
        plain_qp,
        f"--{b}",
        "Content-Type: text/html; charset=utf-8",
        "Content-Transfer-Encoding: base64",
        "",
        b64_encode(html_raw.encode()),
    ]
    if d % 2 == 0:
        lines += [
            f"--{b}",
            'Content-Type: application/octet-stream; name="blob.bin"',
            "Content-Transfer-Encoding: base64",
            "Content-Disposition: attachment",
            "",
            b64_encode(att),
        ]
    lines += [f"--{b}--", ""]
    return "\r\n".join(lines)


EML_STATS_SCHEMA = (
    "doc_id BIGINT, from_addr STRING, subject STRING, n_parts INT, "
    "text_chars BIGINT, html_chars BIGINT, attachment_bytes BIGINT"
)


def eml_extract_stats(docs: DataFrame) -> DataFrame:
    """Synthesize + parse in ONE mapInPandas stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id"] + [
            f.split()[0] for f in EML_STATS_SCHEMA.split(", ")[1:]
        ]
        for pdf in it:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                m = parse_eml(write_eml(int(doc_id), int(n_chars)))
                rows.append((int(doc_id),) + tuple(m[c] for c in cols[1:]))
            yield pd.DataFrame(rows, columns=cols)

    return docs.select("doc_id", "n_chars").mapInPandas(batches, EML_STATS_SCHEMA)
