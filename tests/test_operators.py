

def test_global_cumsum_matches_single_window(spark):
    """global_cumsum ≡ the single-task global window it replaces, on a
    deliberately skewed multi-partition input."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from unity_to_bigquery_spark.operators.enumerate import global_cumsum

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 101).alias("v")
    ).repartition(13)
    got = {
        (r.k, r.cum)
        for r in global_cumsum(df, ["k"], "v", "cum", num_partitions=7).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.k, r.cum)
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want
