"""Multimodal columns for LLM data pipelines: image/audio/video as
opaque ``binary`` columns with a typed metadata struct, processed by
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic FAKE (`_fake_decode`) — the Spark-side
contract (schemas, partitioning, UDF signatures, Arrow batch shapes)
is real and tested, and swapping the kernel for PIL/ffmpeg is a
one-function change. A guarded `decode_real` raises NotImplementedError
naming the missing dependency.

Scale notes: mapInPandas streams Arrow batches — peak memory is one
batch per core, not one blob per row; `spark.sql.execution.arrow.
maxRecordsPerBatch` bounds batch size when blobs are large. Binary
payloads never pass through Python row objects.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "doc_id BIGINT, media_type STRING, payload BINARY, "
    "meta STRUCT<format: STRING, width: INT, height: INT, n_frames: INT>"
)

FEATURE_SCHEMA = (
    "doc_id BIGINT, media_type STRING, n_bytes BIGINT, sha1 STRING, "
    "mean_byte DOUBLE, width INT, height INT"
)

FRAME_SCHEMA = (
    "doc_id BIGINT, frame_idx INT, frame_bytes BINARY, frame_sha1 STRING, "
    "frame_md5 STRING"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Manufacture deterministic binary 'media' from the documents
    fixture: payload = utf-8 bytes of the text, typed metadata derived
    from stable columns. Stands in for `spark.read.format('binaryFile')`
    over an object store.
    """
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            (F.col("n_chars") % 16 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """FAKE decode kernel (deterministic): real pipelines put
    PIL.Image.open / soundfile.read / av.open here."""
    return {
        "n_bytes": len(payload),
        "sha1": hashlib.sha1(payload).hexdigest(),
        "mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
    }


def decode_real(payload: bytes, media_type: str) -> dict:
    """The real-codec hook — intentionally unimplemented here."""
    raise NotImplementedError(
        f"no codec for {media_type} in this container (would require PIL/ffmpeg/soundfile)"
    )


def extract_features(media: DataFrame, passthrough: tuple[str, ...] = ()) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of blobs.

    ``passthrough`` names extra input columns carried through the
    kernel unchanged (appended to the output schema with their input
    types) — lets a caller keep JVM-computed columns (e.g. a pre-kernel
    md5) on the same single scan instead of re-reading the source for a
    join back."""
    schema = FEATURE_SCHEMA
    if passthrough:
        schema += ", " + ", ".join(
            f"{c} {media.schema[c].dataType.simpleString()}" for c in passthrough
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(_fake_decode)
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": decoded.map(lambda d: d["n_bytes"]),
                "sha1": decoded.map(lambda d: d["sha1"]),
                "mean_byte": decoded.map(lambda d: d["mean_byte"]),
                "width": pdf["meta"].map(lambda m: m["width"]),
                "height": pdf["meta"].map(lambda m: m["height"]),
            }
            for c in passthrough:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema)


def sample_frames(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling for 'video' rows: split the payload into
    meta.n_frames chunks, emit every k-th chunk as a row (1→N mapInPandas,
    the shape a real ffmpeg frame sampler produces).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_bytes": [],
                "frame_sha1": [], "frame_md5": [],
            }
            for _, row in pdf.iterrows():
                if row["media_type"] != "video":
                    continue
                payload: bytes = row["payload"]
                n = max(int(row["meta"]["n_frames"]), 1)
                size = max(len(payload) // n, 1)
                for i in range(0, n, every_k):
                    chunk = payload[i * size : (i + 1) * size]
                    out["doc_id"].append(row["doc_id"])
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(chunk)
                    out["frame_sha1"].append(hashlib.sha1(chunk).hexdigest())
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


def materialize_blob_store(docs: DataFrame, root: str) -> None:
    """Write one real payload file per row (``doc_<id>.bin``, bytes =
    utf-8 of ``text``) under ``root`` — the on-disk layout an upstream
    media-ingest job leaves in an object store. Executor-side
    ``foreachPartition`` IO: every partition writes its own rows, the
    driver never holds payloads, so the writer scales with executors
    exactly like any sink. Re-runs start from a fresh directory
    (immutable fixture semantics)."""
    import os
    import shutil

    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)

    def write_partition(rows) -> None:
        for r in rows:
            with open(os.path.join(root, f"doc_{r['doc_id']}.bin"), "wb") as fh:
                fh.write(r["text"].encode("utf-8"))

    docs.select("doc_id", "text").foreachPartition(write_partition)


def read_blob_store(spark, root: str) -> DataFrame:
    """The literal ``spark.read.format('binaryFile')`` scan (SURVEY
    §2B multimodal row): path/length/modificationTime/content columns,
    doc_id recovered from the filename — the standard pattern for
    joining an object-store media dump back to tabular metadata.
    ``pathGlobFilter`` keeps stray non-payload files out of the scan."""
    blobs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(root)
    )
    return blobs.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("length").alias("n_bytes_meta"),
        F.col("content").alias("payload"),
    )


def payload_hashes(media: DataFrame) -> DataFrame:
    """Python-side content hash per blob: (doc_id, media_type,
    payload_md5) with the md5 computed by hashlib over the raw binary
    payload inside a mapInPandas kernel — the building block for
    media-level exact dedup. The hash travels Arrow-batched; at 100 TB
    the payload column never leaves the executor (only the 32-char
    hash is shuffled downstream)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_md5": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(batches, "doc_id BIGINT, media_type STRING, payload_md5 STRING")
