"""Charset sniffing + transcoding — the ingestion step between raw
crawl bytes and every text operator: real corpora arrive as a mix of
UTF-8 (± BOM), UTF-16 (both endiannesses), and legacy Windows-1252,
and a pipeline that guesses wrong poisons dedup and tokenization
downstream.

From-scratch against the public specs (RFC 3629 UTF-8, RFC 2781
UTF-16, the windows-1252 code page):

- a byte-level UTF-8 VALIDATOR/decoder implementing the real state
  machine: continuation-byte checks, OVERLONG-encoding rejection
  (C0/C1 and subtler 3/4-byte overlongs), surrogate-range rejection
  (ED A0..BF), and the U+10FFFF ceiling (F4 90+) — the cases naive
  `& 0x3F` decoders silently mangle;
- UTF-16 decode with BOM-determined endianness and real surrogate-
  pair recombination (lone surrogates are errors);
- the windows-1252 fallback with the 27 remapped 0x80-0x9F points
  (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ' ' " " • – — ˜ ™ š › œ ž Ÿ) over a
  latin-1 base;
- sniffing: BOMs win; otherwise a strict UTF-8 scan — zero errors
  means UTF-8, any error falls back to windows-1252 (the standard
  crawler heuristic).

Spark-side: ONE mapInPandas stage; only fixed-width stats and short
strings cross the Arrow boundary.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# the 27 windows-1252 points that differ from latin-1 (0x81, 0x8D,
# 0x8F, 0x90, 0x9D are unassigned; decode them latin-1-style)
_W1252 = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E, 0x9F: 0x0178,
}

_W1252_ENC = {v: k for k, v in _W1252.items()}


def utf8_scan(data: bytes) -> tuple[list[int], int]:
    """Strict UTF-8 decode: returns (codepoints, n_errors). On an
    invalid sequence, one error is counted, ONE byte is skipped
    (U+FFFD is NOT emitted — counts stay exact), and scanning resumes
    — the standard validating-sniffer behavior."""
    cps: list[int] = []
    errors = 0
    i = 0
    n = len(data)
    while i < n:
        b0 = data[i]
        if b0 < 0x80:
            cps.append(b0)
            i += 1
            continue
        if 0xC2 <= b0 <= 0xDF:
            need, lo, hi, base = 1, 0x80, 0xBF, b0 & 0x1F
        elif b0 == 0xE0:
            need, lo, hi, base = 2, 0xA0, 0xBF, 0  # overlong guard
        elif b0 == 0xED:
            need, lo, hi, base = 2, 0x80, 0x9F, 0xD  # surrogate guard
        elif 0xE1 <= b0 <= 0xEF:
            need, lo, hi, base = 2, 0x80, 0xBF, b0 & 0x0F
        elif b0 == 0xF0:
            need, lo, hi, base = 3, 0x90, 0xBF, 0  # overlong guard
        elif b0 == 0xF4:
            need, lo, hi, base = 3, 0x80, 0x8F, 4  # > U+10FFFF guard
        elif 0xF1 <= b0 <= 0xF3:
            need, lo, hi, base = 3, 0x80, 0xBF, b0 & 0x07
        else:  # C0/C1 overlongs, lone continuations, F5-FF
            errors += 1
            i += 1
            continue
        if i + 1 + need > n:
            errors += 1
            i += 1
            continue
        c1 = data[i + 1]
        if not lo <= c1 <= hi:
            errors += 1
            i += 1
            continue
        cp = (base << 6) | (c1 & 0x3F)
        ok = True
        for k in range(2, need + 1):
            ck = data[i + k]
            if not 0x80 <= ck <= 0xBF:
                ok = False
                break
            cp = (cp << 6) | (ck & 0x3F)
        if not ok:
            errors += 1
            i += 1
            continue
        cps.append(cp)
        i += 1 + need
    return cps, errors


def utf16_decode(data: bytes, little: bool) -> list[int]:
    """UTF-16 decode (post-BOM bytes) with surrogate recombination."""
    if len(data) % 2:
        raise ValueError("odd byte count in UTF-16 payload")
    units = [
        data[i] | (data[i + 1] << 8) if little else (data[i] << 8) | data[i + 1]
        for i in range(0, len(data), 2)
    ]
    cps: list[int] = []
    i = 0
    while i < len(units):
        u = units[i]
        if 0xD800 <= u <= 0xDBFF:
            if i + 1 >= len(units) or not 0xDC00 <= units[i + 1] <= 0xDFFF:
                raise ValueError("lone high surrogate in UTF-16 payload")
            cps.append(0x10000 + ((u - 0xD800) << 10) + (units[i + 1] - 0xDC00))
            i += 2
        elif 0xDC00 <= u <= 0xDFFF:
            raise ValueError("lone low surrogate in UTF-16 payload")
        else:
            cps.append(u)
            i += 1
    return cps


def w1252_decode(data: bytes) -> list[int]:
    return [_W1252.get(b, b) for b in data]


def sniff_decode(data: bytes) -> dict:
    """BOM-first charset sniff, then decode. No BOM: strict UTF-8 scan;
    zero errors means UTF-8, otherwise windows-1252 fallback (the
    error count from the strict scan is reported either way)."""
    if data[:3] == b"\xef\xbb\xbf":
        cps, errors = utf8_scan(data[3:])
        if errors:
            raise ValueError("UTF-8 BOM on an invalid UTF-8 payload")
        enc, has_bom = "utf-8-bom", True
    elif data[:2] == b"\xff\xfe":
        cps, errors, enc, has_bom = utf16_decode(data[2:], True), 0, "utf-16le", True
    elif data[:2] == b"\xfe\xff":
        cps, errors, enc, has_bom = utf16_decode(data[2:], False), 0, "utf-16be", True
    else:
        cps, errors = utf8_scan(data)
        if errors == 0:
            enc, has_bom = "utf-8", False
        else:
            cps = w1252_decode(data)
            enc, has_bom = "windows-1252", False
    text = "".join(map(chr, cps))
    words = text.split()
    return {
        "encoding": enc,
        "has_bom": has_bom,
        "n_bytes": len(data),
        "n_codepoints": len(cps),
        "codepoint_sum": sum(cps),
        "n_ascii": sum(1 for c in cps if c < 128),
        "n_astral": sum(1 for c in cps if c > 0xFFFF),
        "n_utf8_errors": errors,
        "n_words": len(words),
        "first_word": words[0] if words else "",
    }


# planted non-ASCII suffixes (exercise 2/3/4-byte UTF-8, surrogate
# pairs, and the remapped 1252 points): " é€中😀" / " é€“”"
_SUFFIX_UNI = " é€中\U0001f600"
_SUFFIX_1252 = " é€“”"


def write_encoded(doc_id: int, n_chars: int) -> bytes:
    """Deterministic corpus bytes in doc_id%5's encoding: nw =
    n_chars%5+3 ASCII words t{(19*doc_id+i)%100} then a non-ASCII
    suffix. 0: UTF-8, 1: UTF-8+BOM, 2: UTF-16LE+BOM, 3: UTF-16BE+BOM,
    4: windows-1252 (whose bytes are NOT valid UTF-8 — the sniffer
    must fall back)."""
    nw = n_chars % 5 + 3
    words = " ".join(f"t{(19 * doc_id + i) % 100}" for i in range(nw))
    enc = doc_id % 5
    if enc == 4:
        text = words + _SUFFIX_1252
        out = bytearray()
        for ch in text:
            cp = ord(ch)
            if cp < 0x80 or (0xA0 <= cp <= 0xFF):
                out.append(cp)
            else:
                out.append(_W1252_ENC[cp])
        return bytes(out)
    text = words + _SUFFIX_UNI
    if enc == 0:
        return text.encode("utf-8")
    if enc == 1:
        return b"\xef\xbb\xbf" + text.encode("utf-8")
    if enc == 2:
        return b"\xff\xfe" + text.encode("utf-16-le")
    return b"\xfe\xff" + text.encode("utf-16-be")


CHARSET_MEDIA_SCHEMA = "doc_id BIGINT, fmt STRING, payload BINARY"

CHARSET_STATS_SCHEMA = (
    "doc_id BIGINT, encoding STRING, has_bom BOOLEAN, n_bytes BIGINT, "
    "n_codepoints BIGINT, codepoint_sum BIGINT, n_ascii BIGINT, "
    "n_astral INT, n_utf8_errors INT, n_words INT, first_word STRING"
)


def synthesize_encoded_media(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars) -> (doc_id, fmt, payload)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": "text",
                    "payload": [
                        write_encoded(int(d), int(c))
                        for d, c in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, CHARSET_MEDIA_SCHEMA
    )


def charset_decode_stats(media: DataFrame) -> DataFrame:
    """Sniff + transcode in ONE mapInPandas stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id"] + [
            f.split()[0] for f in CHARSET_STATS_SCHEMA.split(", ")[1:]
        ]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = sniff_decode(bytes(payload))
                rows.append((int(doc_id),) + tuple(m[c] for c in cols[1:]))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, CHARSET_STATS_SCHEMA)
