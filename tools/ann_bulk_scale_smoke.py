"""ANN-mode bulk-kNN scale curve (VERDICT r10 #5 "Done =" clause):
record sim_index_bulk_knn_join's PRODUCTION configuration — nprobe ≪
ncells with ncells ∝ √N — at ×1/×10/×100 corpus size, with candidate-
PAIR counts (the work metric: expected O(|Q|·√N·nprobe) against the
exact join's Θ(|Q|·N)), a recall floor vs the exact top-k on a fixed
query sample, and a hot-cell skew note (AQE skew-join observed or
refuted in the executed plan).

Corpus: deterministic CLUSTERED vectors (256 latent centers + small
per-id perturbation, dim 32) — clustered data is the regime IVF recall
is meaningful in; uniformly random high-dim vectors have near-
orthogonal "neighbors" and every ANN method degenerates. |Q| = 2,000
fixed across scales (the kNN-join per-query cost curve), recall on a
200-query subsample. Wall times min-of-2 (CLAUDE.md rule 14).

Usage: python tools/ann_bulk_scale_smoke.py [scales...]   # default 1 10
Results land in BASELINE.md §round-11 ANN bulk-kNN.
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
from pyspark.sql import Window  # noqa: E402

from unity_to_bigquery_spark.session import get_spark  # noqa: E402
from unity_to_bigquery_spark.llm.ann_index import AnnIndex  # noqa: E402
from unity_to_bigquery_spark.llm.similarity import dot, norm  # noqa: E402
from unity_to_bigquery_spark.plans.versioned import VersionedTable  # noqa: E402

BASE_N = 20_000
DIM = 32
NQ = 2_000
NPROBE = 4
K = 5
RECALL_SAMPLE = 200


def corpus_df(spark, n: int):
    center = (
        f"sin(CAST((id % 256) * 1009 + j * 101 AS DOUBLE))"
    )
    noise = f"0.15 * sin(CAST(id * 37 + j * 13 AS DOUBLE))"
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), "
            f"j -> CAST({center} + {noise} AS FLOAT))"
        ).alias("embedding"),
    )


def exact_topk(corpus, queries, k):
    """Brute-force exact top-k for the recall sample: broadcast the
    sample, norms precomputed below the join (rule 14h)."""
    c = corpus.withColumn("__cn", norm(F.col("embedding")))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
    ).withColumn("__qn", norm(F.col("__qv")))
    cand = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = cand.withColumn(
        "cos6",
        F.floor(
            dot(F.col("embedding"), F.col("__qv"))
            / (F.col("__cn") * F.col("__qn")) * 1000000.0 + 0.5
        ).cast("long"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos6"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id")
    )


def run_scale(spark, scale: int) -> dict:
    import math

    n = BASE_N * scale
    ncells = int(2 * math.sqrt(n))
    root = os.path.join(tempfile.gettempdir(), f"annbulk_{scale}_{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    src = VersionedTable(spark, os.path.join(root, "src"))
    src.commit_append(corpus_df(spark, n).repartition(32))
    idx = AnnIndex(
        spark, os.path.join(root, "idx"), src,
        ncells=ncells, scorer="ivf2",
    )
    t0 = time.monotonic()
    idx.build()
    build_s = time.monotonic() - t0
    step = max(1, n // NQ)
    queries = src.read().filter(F.col("vec_id") % step == 0).limit(NQ)
    queries = queries.persist()
    nq = queries.count()
    # candidate-pair count: probe plan joined with the cell histogram
    st = idx._scorer_state()
    probed = idx._probe_plan(queries, st, NPROBE, "query_id")
    hist = idx.assignments.read().groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("csz")
    )
    pairs = probed.join(hist, "cell_id").agg(F.sum("csz")).first()[0]
    cs = hist.agg(
        F.max("csz").alias("mx"), F.avg("csz").alias("mean")
    ).first()
    # bulk ANN serve wall, min-of-2
    wall = None
    out_rows = None
    plan_txt = ""
    for _ in range(2):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        res = idx.topk_bulk(queries, k=K, nprobe=NPROBE)
        out_rows = res.count()
        dt = time.monotonic() - t0
        wall = dt if wall is None else min(wall, dt)
        try:
            plan_txt = res._jdf.queryExecution().executedPlan().toString()
        except Exception:
            plan_txt = ""
    # recall floor vs exact on a subsample
    sub = queries.limit(RECALL_SAMPLE).persist()
    sub.count()
    ann = idx.topk_bulk(sub, k=K, nprobe=NPROBE).select(
        "query_id", F.col(idx.id_col).alias("vec_id")
    )
    ex = exact_topk(src.read(), sub, K)
    hit = ann.join(ex, ["query_id", "vec_id"], "left_semi").count()
    recall = hit / (RECALL_SAMPLE * K)
    sub.unpersist()
    queries.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "scale": scale, "n": n, "ncells": ncells, "nprobe": NPROBE,
        "nq": int(nq), "build_s": round(build_s, 1),
        "bulk_wall_s": round(wall, 2), "out_rows": int(out_rows),
        "cand_pairs": int(pairs),
        "pairs_per_query": round(pairs / nq, 1),
        "exact_pairs_per_query": n - 1,
        "cell_max": int(cs["mx"]), "cell_mean": round(cs["mean"], 1),
        "recall_at_5": round(recall, 3),
        "aqe_skew_in_plan": "skew=true" in plan_txt.lower()
        or "skewed" in plan_txt.lower(),
    }


def main():
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark(app_name="ann-bulk-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    for s in scales:
        print(json.dumps(run_scale(spark, s)))


if __name__ == "__main__":
    main()
