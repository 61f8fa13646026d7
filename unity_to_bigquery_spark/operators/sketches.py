"""Count-Min Sketch as pure relational dataflow.

A CMS is d hash rows × w buckets of counters; estimate(key) = min over
rows of its bucket counter. Expressed relationally: explode each input
row into d (row, bucket) coordinates (md5-family hashes — the same
portable trick as the MinHash/SimHash operators), one hash aggregate
builds the counter table, and a lookup is a join + min.

Scale story: the sketch table is d×w rows REGARDLESS of input size —
the classic sublinear summary for heavy-hitter/frequency queries over
100 TB streams. Map-side partial aggregation means the full input
never shuffles: only d×w partial counters per task do. Being pure
DataFrame ops, the whole construction is DuckDB-oracle-verifiable,
unlike binary sketch blobs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _bucket(key: Column, row: Column, width: int) -> Column:
    """Portable bucket id: md5-family hash of (key, row) mod width."""
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit("#"), row)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_build(
    df: DataFrame, key: Column | str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Build the counter table: (hash_row, bucket, cnt), d×w rows max."""
    k = F.col(key) if isinstance(key, str) else key
    coords = df.select(
        k.alias("__k"), F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("hash_row")
    ).select("hash_row", _bucket(F.col("__k"), F.col("hash_row"), width).alias("bucket"))
    return coords.groupBy("hash_row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Estimate each key's frequency: min over hash rows of its bucket
    counter (0 if a bucket is absent). ``keys`` should be distinct."""
    probes = keys.select(
        key_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("hash_row"),
    ).withColumn("bucket", _bucket(F.col(key_col), F.col("hash_row"), width))
    return (
        probes.join(F.broadcast(sketch), on=["hash_row", "bucket"], how="left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )
