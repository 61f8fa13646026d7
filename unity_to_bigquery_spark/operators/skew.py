"""Skew-mitigation operators for hot keys at 100 TB.

AQE's skew-join splitting (on by default in the session factory)
handles most cases at runtime; these explicit composites cover the two
patterns AQE can't fix:

- ``salted_aggregate``: a hot grouping key funnels into one reducer.
  Two-phase aggregation over (key, salt) then (key) keeps every reducer
  bounded. The salt is derived deterministically from a disambiguating
  column (never rand() — results must be reproducible).
- ``replicated_salt_join``: a hot join key on the large side. The large
  side gets a deterministic salt; the SMALL side is replicated across
  all salt values (explode over 0..n-1), restoring exact join semantics
  while spreading the hot key over n reducers.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_SALT = "__salt"


def _det_salt(col: Column, n: int) -> Column:
    """Deterministic salt in [0, n): hash of a high-cardinality column."""
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    salt_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """count(*) + SUMs per ``keys`` via two-phase salted aggregation.

    ``sum_cols`` maps output alias → input column. Phase 1 aggregates
    (keys, salt) partials; phase 2 merges per key. Algebraic aggregates
    only — exact for count/sum/min/max.
    """
    salted = df.withColumn(_SALT, _det_salt(F.col(salt_col), n_salt))
    partial = salted.groupBy(*keys, _SALT).agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[F.sum(src).alias(f"__s_{alias}") for alias, src in sum_cols.items()],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__cnt").alias("n"),
        *[F.sum(f"__s_{alias}").alias(alias) for alias in sum_cols],
    )


def replicated_salt_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's hot keys spread across ``n_salt``
    reducers and the small side replicated to every salt value.
    Exactly equivalent to ``large.join(small, key, how)`` for how in
    {inner, left, left_semi, left_anti}. Right/full outer are rejected:
    an unmatched small-side row would surface once per replica.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"replicated_salt_join does not support how={how!r}: unmatched "
            "small-side rows would be emitted n_salt times"
        )
    lsalted = large.withColumn(_SALT, _det_salt(F.col(salt_col), n_salt))
    rreplicated = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return lsalted.join(rreplicated, on=[key, _SALT], how=how).drop(_SALT)


def salted_topk_per_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    k: int,
    salt_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """EXACT top-k per key with the per-key window spread over
    ``n_salt`` reducers — the politeness-quota / hot-key form of the
    two-phase trick (a crawl frontier where one host owns half the
    URLs funnels a plain ``Window.partitionBy(host)`` into one task).

    Phase 1 ranks within (keys, salt): every reducer sees only its
    salt slice of the hot key and keeps ≤ k rows. Phase 2 ranks the
    ≤ k·n_salt survivors per key — a bounded set regardless of how hot
    the key is. Exact because the global top-k of a union is contained
    in the union of per-slice top-ks. ``order_cols`` must be a unique
    total order (CLAUDE.md rule 7) or ranks are nondeterministic.
    Output = input columns + ``rk`` (1-based rank within the key).
    """
    from pyspark.sql import Window

    salted = df.withColumn(_SALT, _det_salt(F.col(salt_col), n_salt))
    w1 = Window.partitionBy(*keys, _SALT).orderBy(*order_cols)
    survivors = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1", _SALT)
    )
    w2 = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
    )
