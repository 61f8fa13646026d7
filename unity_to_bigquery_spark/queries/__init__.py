"""Declared query inventory — importing this package registers every
query into :mod:`unity_to_bigquery_spark.registry`.
"""

from unity_to_bigquery_spark.queries import (  # noqa: F401
    aggregates,
    corpus,
    events,
    joins,
    linkage,
    llm,
    pipeline,
    recursive,
    retrieval,
    scalars,
    setops,
    tpch,
    tpch2,
    tpch3,
    tpch4,
    training,
    udfs,
    windows,
)
