"""Dedup clustering: connected components over near-duplicate pair
edges — the step after candidate generation in every large-scale dedup
pipeline (LSH pairs → clusters → one survivor per cluster).

Algorithm: iterative min-label propagation. Each node starts labeled
with its own id; each round every node takes the minimum label among
itself and its neighbors; converged when no label changes. This is the
standard Spark formulation (no GraphX dependency): per round, one join
edges×labels + one min-aggregate — all shuffles on the node id.

Scale notes: rounds needed = graph diameter (near-dup clusters are
tiny cliques/chains, so 3-5 rounds in practice; ``max_iter`` bounds
pathological chains). The per-round convergence check is a count()
action on a changed-labels filter — one job per round, no driver-side
data. For 100 TB edge sets, checkpoint labels every ~5 rounds to cut
lineage (hook provided).

This operator is genuinely non-SQL-expressible for unbounded diameter
(the driver records a rows-only check); a bounded-diameter recursive
CTE could oracle small graphs, while the property tests assert the
definition directly: every edge's endpoints share a label, and labels
are cluster minima.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    ids: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 15,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Label every node in ``ids`` with the minimum node id reachable
    through ``edges`` (undirected). Returns (id_col, component).
    """
    # Persist the (static) edge set once: every iteration's convergence
    # count is an action, and without this the ENTIRE upstream pipeline
    # that produced the edges (e.g. the MinHash candidate generator)
    # re-executes per round — observed 59 s vs 11 s on the dedup query.
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    # Round 0 for free: with identity labels the neighbor-min is just
    # MIN(v) per node straight off the edge set — one aggregate, no
    # labels-join, and no convergence count (round 0 always changes
    # something unless the graph has no edges at all).
    nbr0 = sym.groupBy("u").agg(F.min("v").alias("nbr_min"))
    labels = (
        ids.select(F.col(id_col).alias("u"))
        .join(nbr0, on="u", how="left")
        .select(
            "u",
            F.least(F.col("u"), F.coalesce("nbr_min", F.col("u"))).alias("component"),
        )
        .persist()
    )

    for it in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("u", "v2"), sym.v == F.col("v2"))
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, on="u", how="left")
            .select(
                "u",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                F.col("component").alias("__old"),
            )
        )
        # Materialize each round (labels are one row per node — small
        # relative to edges) and cut lineage periodically so round N
        # doesn't replay rounds 1..N-1.
        new_labels = new_labels.persist()
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("component") < F.col("__old")).count()
        old = labels
        labels = new_labels.drop("__old")
        old.unpersist()  # every generation is persisted (incl. round 0)
        if changed == 0:
            break
    sym.unpersist()
    return labels.withColumnRenamed("u", id_col)


def dedup_survivors(
    ids: DataFrame, edges: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """One row per near-dup cluster: the minimum-id survivor plus the
    cluster size — the keep-list a dedup pipeline joins back against.
    """
    comp = connected_components(ids, edges, id_col=id_col)
    return comp.groupBy("component").agg(
        F.min(id_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
