"""Persisted-ANN-index scale smoke (VERDICT r6 #1 "Done =" clause):
prove that incremental refresh cost is proportional to the APPENDED
vectors, not the corpus, and that serving reads only the probed cells.

Method: synthesize deterministic embedding corpora at N and SCALE×N
(dim 32), build the index once at each size, append an IDENTICAL
fixed-size delta (monotone ids above the corpus), and time
``AnnIndex.refresh()`` at both sizes. A corpus-proportional refresh
would scale ~SCALE×; a delta-proportional one stays ~flat (the only
corpus-coupled term is the stored-centroid count C=√N inside the
delta × C scoring join, so the honest expectation is √SCALE at
default sizing — pass an explicit --ncells to pin C and make the
envelope exactly flat). Serving cost is reported alongside with the
probed-vs-total file counts from the manifest.

Timings are min-of-2 after a warmup refresh of the same shape
(CLAUDE.md rule 14: never record single-shot numbers).

Usage: python tools/ann_index_smoke.py [N] [SCALE] [DELTA] [--flat-c]
Defaults: N=20_000, SCALE=10, DELTA=2_000.
Results land in BASELINE.md §ann-index.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from unity_to_bigquery_spark.llm.ann_index import AnnIndex  # noqa: E402
from unity_to_bigquery_spark.plans.versioned import VersionedTable  # noqa: E402
from unity_to_bigquery_spark.session import get_spark  # noqa: E402

DIM = 32


def synth(spark, n, start=0):
    """Deterministic pseudo-random unit-ish vectors: hash-derived
    components, no RNG, reproducible across runs/scales."""
    return (
        spark.range(start, start + n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda j: (
                    F.pmod(F.xxhash64(F.col("id") * DIM + j), F.lit(2001)) - 1000.0
                )
                / 1000.0,
            ).alias("embedding"),
        )
    )


def run_one(spark, root, n, delta, ncells, scorer="flat"):
    shutil.rmtree(root, ignore_errors=True)
    src = VersionedTable(spark, os.path.join(root, "source"))
    src.commit_append(synth(spark, n).repartition(32))
    idx = AnnIndex(
        spark, os.path.join(root, "index"), src, ncells=ncells, scorer=scorer
    )
    t0 = time.monotonic()
    idx.build()
    t_build = time.monotonic() - t0

    # warmup refresh (same delta shape), then two measured refreshes
    walls = []
    base = n
    for i in range(3):
        src.commit_append(synth(spark, delta, start=base).repartition(8))
        base += delta
        t0 = time.monotonic()
        idx.refresh()
        walls.append(time.monotonic() - t0)
    t_refresh = min(walls[1:])  # min-of-2 after warmup

    queries = synth(spark, 8, start=base + 10_000_000)
    t0 = time.monotonic()
    nrows = idx.topk(queries, k=5, nprobe=4).count()
    t_serve = time.monotonic() - t0
    total_files = len(idx.assignments.manifest()["files"])
    # representative probe footprint: 4 of C cells
    kept, skipped = idx.assignments.prune_files_eq("cell_id", [0, 1, 2, 3])
    spark.catalog.clearCache()
    return {
        "n": n,
        "ncells": ncells or int(n**0.5),
        "build_s": round(t_build, 2),
        "refresh_s": round(t_refresh, 2),
        "serve_s": round(t_serve, 2),
        "serve_rows": nrows,
        "files_total": total_files,
        "files_probed_4cells": len(kept),
    }


def run_one_retract(spark, root, n, k, ncells):
    """Round-8 retraction smoke: identical fixed-size RETRACTION
    (delete a contiguous k-key block, merge-update another) folded by
    refresh() at corpus N — the claim is cost ∝ the retraction delta.
    The source is committed RANGE-CLUSTERED on vec_id so the delete
    commit's CDC candidate pruning (key range vs manifest stats) keeps
    the then-live scan ∝ the touched block's files, the honest 100 TB
    deployment shape (an entity's rows cluster; uniformly-scattered
    keys would make any engine's delete CDC scan every file)."""
    shutil.rmtree(root, ignore_errors=True)
    src = VersionedTable(spark, os.path.join(root, "source"))
    src.commit_append(
        synth(spark, n).repartitionByRange(32, "vec_id").sortWithinPartitions("vec_id")
    )
    idx = AnnIndex(spark, os.path.join(root, "index"), src, ncells=ncells)
    idx.build()
    walls = []
    for i in range(3):  # warmup + 2 measured (rule 14)
        lo = 1000 + i * 3 * k
        src.commit_delete_where(
            spark.range(lo, lo + k).select(F.col("id").alias("vec_id")), "vec_id"
        )
        upd = synth(spark, k, start=lo + k).withColumn(
            "embedding", F.transform(F.col("embedding"), lambda x: -x)
        )
        src.merge_upsert(upd, "vec_id")
        t0 = time.monotonic()
        idx.refresh()
        walls.append(time.monotonic() - t0)
    spark.catalog.clearCache()
    return {
        "n": n,
        "ncells": ncells or int(n**0.5),
        "retract_refresh_s": round(min(walls[1:]), 2),
        "index_rows": idx.assignments.read().count(),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flat_c = "--flat-c" in sys.argv
    retract = "--retract" in sys.argv
    n = int(args[0]) if len(args) > 0 else 20_000
    scale = int(args[1]) if len(args) > 1 else 10
    delta = int(args[2]) if len(args) > 2 else 2_000
    spark = get_spark(app_name="ann-index-smoke", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(tempfile.gettempdir(), "u2bq_ann_smoke")
    ncells_small = max(16, int(n**0.5)) if flat_c else None
    if retract:
        small = run_one_retract(spark, os.path.join(root, "s"), n, delta, ncells_small)
        big = run_one_retract(
            spark, os.path.join(root, "b"), n * scale, delta, ncells_small
        )
        ratio = round(
            big["retract_refresh_s"] / max(small["retract_refresh_s"], 1e-9), 2
        )
        print(json.dumps({
            "mode": "retract", "scale": scale, "delta": delta, "flat_c": flat_c,
            "small": small, "big": big,
            "retract_refresh_ratio": ratio,
            "corpus_proportional_would_be": float(scale),
        }))
        shutil.rmtree(root, ignore_errors=True)
        return
    scorer = "ivf2" if "--scorer=ivf2" in sys.argv else "flat"
    small = run_one(spark, os.path.join(root, "s"), n, delta, ncells_small,
                    scorer=scorer)
    big = run_one(spark, os.path.join(root, "b"), n * scale, delta,
                  ncells_small, scorer=scorer)
    ratio = round(big["refresh_s"] / max(small["refresh_s"], 1e-9), 2)
    print(json.dumps({
        "scale": scale, "delta": delta, "flat_c": flat_c, "scorer": scorer,
        "small": small, "big": big,
        "refresh_ratio": ratio,
        "corpus_proportional_would_be": float(scale),
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
