"""ZIP landing-zone extraction — dataset dumps and bulk exports ship
as .zip at least as often as .tar.gz; this is the stdlib-``zipfile``
member walk over opaque binary payloads, the same Arrow-batched
pattern as every media kernel (payload dies in the executor, only
per-member stats/text reach the shuffle).

Reference scope: the reference ingests gzip'd NDJSON exports from a
landing zone (SURVEY §2A A4-A5, `sources/landing.py`); real Unity-
style exports also arrive zipped, so the archive walk completes the
container matrix. CRC-32 verification comes free from ``zipfile`` —
a member read that survives IS checksum-verified, so the stats oracle
doubles as an integrity check on both methods (STORED and DEFLATED
members are planted alternately).
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def zip_members(payload: bytes) -> list[dict]:
    """REAL zip walk: central-directory listing via stdlib zipfile,
    every member read fully (CRC-32 verified by the library — a
    corrupted member raises BadZipFile, honest failure). Returns one
    dict per member: name, method ('stored'/'deflated'), n_bytes,
    data."""
    out = []
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for info in zf.infolist():
            data = zf.read(info.filename)  # CRC-checked by zipfile
            out.append(
                {
                    "name": info.filename,
                    "method": "stored"
                    if info.compress_type == zipfile.ZIP_STORED
                    else "deflated",
                    "n_bytes": len(data),
                    "data": data,
                }
            )
    return out


def synthesize_zip(doc_id: int, n_chars: int) -> bytes:
    """Deterministic .zip: ``M = n_chars%4 + 2`` members named
    ``doc/<doc_id>/<m>.bin``; member ``m`` carries the byte ramp
    ``v(i) = (23*doc_id + 11*m + i) % 256`` of length
    ``L_m = n_chars%150 + 40 + 5*m``, STORED for even m and DEFLATED
    for odd (both decode paths on every archive). Timestamps pinned
    for bit-determinism."""
    nm = n_chars % 4 + 2
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for m in range(nm):
            a = (23 * doc_id + 11 * m) % 256
            length = n_chars % 150 + 40 + 5 * m
            data = bytes((a + i) % 256 for i in range(length))
            info = zipfile.ZipInfo(
                f"doc/{doc_id}/{m}.bin", date_time=(2020, 1, 1, 0, 0, 0)
            )
            info.compress_type = (
                zipfile.ZIP_STORED if m % 2 == 0 else zipfile.ZIP_DEFLATED
            )
            zf.writestr(info, data)
    return buf.getvalue()


def synthesize_zip_media(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars) -> (doc_id, payload): .zip archives."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        synthesize_zip(int(d), int(c))
                        for d, c in zip(pdf["doc_id"], pdf["n_chars"])
                    ],
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches, "doc_id BIGINT, payload BINARY"
    )


ZIP_STATS_SCHEMA = (
    "doc_id BIGINT, n_members INT, n_deflated INT, name_len_sum BIGINT, "
    "total_bytes BIGINT, byte_sum BIGINT, first_b INT, last_b INT"
)


def zip_extract_stats(media: DataFrame) -> DataFrame:
    """REAL zip-extraction stats: member walk + CRC-verified reads per
    archive, reduced to integer-exact aggregates a SQL oracle
    re-derives from the fixture closed forms."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split()[0] for f in ZIP_STATS_SCHEMA.split(", ")]
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                members = zip_members(bytes(payload))
                datas = [m["data"] for m in members]
                rows.append(
                    (
                        int(doc_id),
                        len(members),
                        sum(1 for m in members if m["method"] == "deflated"),
                        sum(len(m["name"]) for m in members),
                        sum(len(d) for d in datas),
                        sum(sum(d) for d in datas),
                        datas[0][0] if datas and datas[0] else -1,
                        datas[-1][-1] if datas and datas[-1] else -1,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(batches, ZIP_STATS_SCHEMA)
