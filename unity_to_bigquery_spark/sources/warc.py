"""WARC (Web ARChive, ISO 28500) reader — the container web crawls
actually ship in (Common Crawl et al.), implemented stdlib-only from
the public WARC/1.0 specification.

Format recap: a .warc.gz is a sequence of INDEPENDENTLY-gzipped
members, one WARC record each (the spec's recommended layout — it is
what makes the format splittable: a distributed reader can seek to
any member boundary). Each record is

    WARC/1.0 CRLF
    <named-fields: WARC-Type, WARC-Target-URI, Content-Length, ...> CRLF
    CRLF
    <Content-Length bytes of block>
    CRLF CRLF

For ``response`` records the block is a full HTTP/1.1 response
(status line + headers + CRLF CRLF + body); the training-data payload
is the HTTP body, so the reader parses that framing too.

Scale design: parsing runs inside mapInPandas over opaque binary
payloads — at 100 TB each executor walks its own members and only
per-record STATS (or extracted text) reach the shuffle, never the
raw archive bytes. The per-member gzip layout means a future
binaryFile/offset-sharded scan can split one archive across tasks;
here one archive == one row, parallelism across archives.

Reference scope: landing-zone ingestion of crawler exports (the
reference's gzip/NDJSON path, SURVEY §2A A4-A5) extended to the
standard crawl container.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def gzip_members(payload: bytes) -> Iterator[bytes]:
    """Split a multi-member gzip stream into decompressed members —
    stdlib zlib ``decompressobj`` with the 16+MAX_WBITS gzip wrapper,
    iterated over ``unused_data`` (the documented multi-member
    recipe). A plain (non-gzip) payload yields itself whole."""
    if payload[:2] != b"\x1f\x8b":
        yield payload
        return
    rest = payload
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = d.decompress(rest)
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        yield out + d.flush()
        rest = d.unused_data
    if rest:
        raise ValueError(f"trailing garbage after gzip members ({len(rest)} bytes)")


def _parse_headers(block: bytes, start: int) -> tuple[dict, int]:
    """Parse CRLF-terminated header lines from ``start`` until the
    blank line; returns (lowercased-name dict, offset past CRLFCRLF).
    Folded continuation lines (obs-fold) are unfolded per the spec."""
    headers: dict = {}
    pos = start
    last = None
    while True:
        end = block.index(b"\r\n", pos)
        line = block[pos:end]
        pos = end + 2
        if not line:
            return headers, pos
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        name, _, value = line.partition(b":")
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")


def parse_warc(payload: bytes) -> list[dict]:
    """REAL WARC parse: gzip-member walk -> record framing (version
    line, named fields, Content-Length block, CRLF CRLF trailer) ->
    HTTP response framing for ``response`` records. Returns one dict
    per record: warc_type, target_uri, http_status (response records,
    else None), body (the HTTP body for responses, the raw block
    otherwise). Strict: bad version lines, short blocks, or a missing
    Content-Length raise — honest failure, not silent truncation."""
    records = []
    for member in gzip_members(payload):
        pos = 0
        while pos < len(member):
            if member[pos : pos + 2] == b"\r\n":  # inter-record slack
                pos += 2
                continue
            eol = member.index(b"\r\n", pos)
            version = member[pos:eol]
            if not version.startswith(b"WARC/"):
                raise ValueError(f"bad WARC version line {version[:20]!r}")
            headers, body_start = _parse_headers(member, eol + 2)
            if "content-length" not in headers:
                raise ValueError("WARC record missing Content-Length")
            clen = int(headers["content-length"])
            block = member[body_start : body_start + clen]
            if len(block) != clen:
                raise ValueError(
                    f"short WARC block: {len(block)} < {clen}"
                )
            pos = body_start + clen
            if member[pos : pos + 4] == b"\r\n\r\n":
                pos += 4
            wtype = headers.get("warc-type", "")
            rec = {
                "warc_type": wtype,
                "target_uri": headers.get("warc-target-uri"),
                "http_status": None,
                "body": block,
            }
            if wtype == "response" and block.startswith(b"HTTP/"):
                seol = block.index(b"\r\n")
                parts = block[:seol].split(b" ", 2)
                rec["http_status"] = int(parts[1])
                hh, hbody = _parse_headers(block, seol + 2)
                body = block[hbody:]
                if "content-length" in hh:
                    body = body[: int(hh["content-length"])]
                rec["body"] = body
            records.append(rec)
    return records


# ---- deterministic fixtures -------------------------------------------


def _gzip_member(data: bytes) -> bytes:
    """One standalone gzip member (mtime pinned to 0 for determinism)."""
    c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    raw = c.compress(data) + c.flush()
    # pin MTIME (bytes 4-8) so fixtures are bit-deterministic
    return raw[:4] + b"\x00\x00\x00\x00" + raw[8:]


def _record(wtype: str, extra: dict, block: bytes) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {wtype}"]
    head += [f"{k}: {v}" for k, v in extra.items()]
    head += [f"Content-Length: {len(block)}", "", ""]
    return "\r\n".join(head).encode("latin-1") + block + b"\r\n\r\n"


def synthesize_warc(doc_id: int, n_chars: int) -> bytes:
    """Deterministic .warc.gz: one warcinfo record plus
    ``R = n_chars%3 + 1`` request/response pairs, each record its own
    gzip member (the splittable layout). Response ``r`` carries an
    HTTP/1.1 payload whose body is the byte ramp
    ``v(i) = (31*doc_id + 17*r + i) % 256`` of length
    ``L_r = n_chars%200 + 50 + 7*r`` and status 200 when
    ``(doc_id + r) % 3 != 0`` else 404 — closed forms a SQL oracle
    re-derives (periodic-ramp byte sums, CASE status sums)."""
    nresp = n_chars % 3 + 1
    members = [
        _gzip_member(
            _record(
                "warcinfo",
                {"WARC-Record-ID": f"<urn:uuid:info-{doc_id}>"},
                b"software: u2bq-spark-synth\r\n",
            )
        )
    ]
    for r in range(nresp):
        uri = f"http://example.com/{doc_id}/{r}"
        members.append(
            _gzip_member(
                _record(
                    "request",
                    {"WARC-Target-URI": uri},
                    f"GET /{doc_id}/{r} HTTP/1.1\r\nHost: example.com\r\n\r\n".encode(),
                )
            )
        )
        length = n_chars % 200 + 50 + 7 * r
        a = (31 * doc_id + 17 * r) % 256
        body = bytes((a + i) % 256 for i in range(length))
        status = 200 if (doc_id + r) % 3 != 0 else 404
        reason = "OK" if status == 200 else "Not Found"
        http = (
            f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: application/octet-stream\r\n"
            f"Content-Length: {length}\r\n\r\n"
        ).encode() + body
        members.append(
            _gzip_member(
                _record("response", {"WARC-Target-URI": uri}, http)
            )
        )
    return b"".join(members)


def synthesize_warc_media(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars) -> (doc_id, payload): .warc.gz archives."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        synthesize_warc(int(d), int(c))
                        for d, c in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, "doc_id BIGINT, payload BINARY"
    )


WARC_STATS_SCHEMA = (
    "doc_id BIGINT, n_records INT, n_responses INT, n_ok INT, "
    "status_sum BIGINT, body_bytes BIGINT, body_byte_sum BIGINT, "
    "first_b INT, last_b INT"
)


def warc_extract_stats(media: DataFrame) -> DataFrame:
    """REAL WARC extraction stats over Arrow batches: gzip-member walk
    + record framing + HTTP body extraction per archive, reduced to
    integer-exact stats (record/response/2xx counts, status sum, body
    byte totals, first byte of the first response body / last byte of
    the last). Archives die in the executor; ~70 bytes/row shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split()[0] for f in WARC_STATS_SCHEMA.split(", ")]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                recs = parse_warc(bytes(payload))
                resps = [r for r in recs if r["warc_type"] == "response"]
                bodies = [r["body"] for r in resps]
                total = sum(len(b) for b in bodies)
                bsum = sum(sum(b) for b in bodies)
                rows.append(
                    (
                        int(doc_id),
                        len(recs),
                        len(resps),
                        sum(1 for r in resps if 200 <= r["http_status"] < 300),
                        sum(r["http_status"] for r in resps),
                        total,
                        bsum,
                        bodies[0][0] if bodies and bodies[0] else -1,
                        bodies[-1][-1] if bodies and bodies[-1] else -1,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, WARC_STATS_SCHEMA)


# ---- splittable WARC scan (Python Data Source + CDX offsets) ----------
#
# The per-member gzip layout exists precisely so a distributed reader
# can split ONE archive across tasks — but finding member boundaries
# requires either a scan or an index. Real crawls ship the index:
# Common Crawl publishes CDX files recording each record's byte
# offset/length. This source consumes that layout: a ``.cdx`` sidecar
# (JSON lines: offset, length) per ``.warc.gz`` lets the planner cut
# MEMBER-RANGE partitions and each executor seek straight to its
# byte span — no decompression at planning time, no whole-file
# affinity. Files without a sidecar degrade to one partition per
# file (still correct, just unsplit).

import json
import os


def write_warc_landing(
    docs: list[tuple[int, int]], root: str, n_files: int = 8
) -> None:
    """Deterministic landing zone: docs (doc_id, n_chars) are routed
    to ``doc_id % n_files``; each file is the concatenation of the
    per-doc archives (gzip members concatenate into one valid WARC)
    plus a CDX sidecar with every member's (offset, length)."""
    os.makedirs(root, exist_ok=True)
    buckets: dict = {i: [] for i in range(n_files)}
    for doc_id, n_chars in docs:
        buckets[doc_id % n_files].append((doc_id, n_chars))
    for i, members in buckets.items():
        blob = bytearray()
        cdx = []
        for doc_id, n_chars in sorted(members):
            payload = synthesize_warc(doc_id, n_chars)
            for member in _split_gzip_members_raw(payload):
                cdx.append({"offset": len(blob), "length": len(member)})
                blob += member
        with open(os.path.join(root, f"part-{i:03d}.warc.gz"), "wb") as f:
            f.write(blob)
        with open(os.path.join(root, f"part-{i:03d}.warc.cdx"), "w") as f:
            for row in cdx:
                f.write(json.dumps(row) + "\n")


def _split_gzip_members_raw(payload: bytes) -> list:
    """COMPRESSED byte spans of each gzip member (offset bookkeeping
    for CDX writing) — decompress to find the boundary, keep the raw
    bytes."""
    import zlib

    out = []
    rest = payload
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        d.decompress(rest)
        consumed = len(rest) - len(d.unused_data)
        out.append(rest[:consumed])
        rest = d.unused_data
    if rest:
        raise ValueError("trailing bytes after gzip members")
    return out


try:  # Python Data Source API (pyspark >= 4)
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    WARC_SOURCE_SCHEMA = (
        "file STRING, warc_type STRING, target_uri STRING, "
        "http_status INT, body BINARY"
    )

    class WarcReader(DataSourceReader):
        def __init__(self, options):
            self.path = options["path"]
            self.members_per_partition = int(
                options.get("members_per_partition", "256")
            )

        def partitions(self):
            # driver-side planning touches only the file LISTING and
            # the (small) CDX sidecars — never archive bytes
            parts = []
            for fn in sorted(os.listdir(self.path)):
                if not fn.endswith(".warc.gz"):
                    continue
                full = os.path.join(self.path, fn)
                cdx = full[: -len(".gz")] + ".cdx"
                if os.path.exists(cdx):
                    with open(cdx) as f:
                        rows = [json.loads(line) for line in f]
                    for lo in range(0, len(rows), self.members_per_partition):
                        chunk = rows[lo : lo + self.members_per_partition]
                        parts.append(
                            InputPartition(
                                (
                                    full,
                                    chunk[0]["offset"],
                                    chunk[-1]["offset"] + chunk[-1]["length"],
                                )
                            )
                        )
                else:  # no index -> whole file, unsplit but correct
                    parts.append(InputPartition((full, 0, -1)))
            return parts

        def read(self, partition):
            full, lo, hi = partition.value
            with open(full, "rb") as f:
                f.seek(lo)
                blob = f.read() if hi < 0 else f.read(hi - lo)
            base = os.path.basename(full)
            for rec in parse_warc(blob):
                yield (
                    base,
                    rec["warc_type"],
                    rec["target_uri"],
                    rec["http_status"],
                    rec["body"],
                )

    class WarcStreamReader(DataSourceStreamReader):
        """Streaming crawl ingest: the landing zone grows by whole
        .warc.gz files, and the stream's OFFSET is the count of files
        (sorted by name) already delivered — restart-safe because
        landing names are append-only. Pacing follows the engine's
        hard-won rule: the floor ratchets to each PLANNED batch's end
        at partitions() time (latestOffset is called multiple times
        per trigger, so a per-call ratchet would over-pace), and the
        cap is consumed + max_files_per_batch."""

        def __init__(self, options):
            self.path = options["path"]
            self.max_files = int(options.get("max_files_per_batch", "16"))
            self._consumed = None

        def _files(self) -> list:
            return sorted(
                fn for fn in os.listdir(self.path) if fn.endswith(".warc.gz")
            )

        def initialOffset(self) -> dict:
            self._consumed = 0
            return {"files": 0}

        def latestOffset(self) -> dict:
            n = len(self._files())
            if self.max_files > 0 and self._consumed is not None:
                n = min(n, self._consumed + self.max_files)
            return {"files": n}

        def partitions(self, start: dict, end: dict):
            files = self._files()
            self._consumed = end["files"]  # the only progress signal
            return [
                InputPartition(os.path.join(self.path, fn))
                for fn in files[start["files"] : end["files"]]
            ]

        def read(self, partition):
            full = partition.value
            with open(full, "rb") as f:
                blob = f.read()
            base = os.path.basename(full)
            # partition-based stream readers return ITERATORS (the
            # materialized-list rule applies to the Simple prefetching
            # reader, not this API)
            return iter(
                [
                    (
                        base,
                        rec["warc_type"],
                        rec["target_uri"],
                        rec["http_status"],
                        rec["body"],
                    )
                    for rec in parse_warc(blob)
                ]
            )

        def commit(self, end: dict) -> None:
            pass  # file delivery is idempotent per offset range

    class WarcDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "warc"

        def schema(self) -> str:
            return WARC_SOURCE_SCHEMA

        def reader(self, schema):
            return WarcReader(self.options)

        def streamReader(self, schema):
            return WarcStreamReader(self.options)

    def register_warc_source(spark) -> None:
        """Idempotently register the splittable WARC source."""
        try:
            spark.dataSource.register(WarcDataSource)
        except Exception:
            pass  # already registered in this session

except ImportError:  # pragma: no cover - pyspark<4 fallback
    pass


def write_html_warc_landing(
    docs: list[tuple[int, int]], root: str, n_files: int = 8
) -> None:
    """Crawl-shaped landing zone for the end-to-end corpus pipeline:
    every doc becomes ONE response record whose body is a REAL HTML
    page, and pages are deliberately DUPLICATED across docs — the
    content is write_html(g, 100+g) with g = doc_id % 40, so ~N/40
    docs share each of 40 distinct pages (the boilerplate-duplication
    shape of real crawls). CDX sidecars as in write_warc_landing."""
    from unity_to_bigquery_spark.llm.html import write_html

    os.makedirs(root, exist_ok=True)
    buckets: dict[int, list] = {i: [] for i in range(n_files)}
    for doc_id, n_chars in docs:
        buckets[doc_id % n_files].append((doc_id, n_chars))
    for i, members in buckets.items():
        blob = bytearray()
        cdx = []
        for doc_id, _n_chars in sorted(members):
            g = doc_id % 40
            page = write_html(g, 100 + g).encode("utf-8")
            uri = f"http://site{g % 4}.example/doc/{doc_id}"
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(page)}\r\n\r\n"
            ).encode() + page
            member = _gzip_member(
                _record("response", {"WARC-Target-URI": uri}, http)
            )
            cdx.append({"offset": len(blob), "length": len(member)})
            blob += member
        with open(os.path.join(root, f"part-{i:03d}.warc.gz"), "wb") as f:
            f.write(blob)
        with open(os.path.join(root, f"part-{i:03d}.warc.cdx"), "w") as f:
            for row in cdx:
                f.write(json.dumps(row) + "\n")
