"""Composite relational operators built from Spark built-ins.

Each operator here is a DataFrame-level composition (SURVEY.md §2B
"composite" rows) — no custom Catalyst rules needed; Catalyst still
optimizes through these because they are ordinary declarative plans.
"""

from unity_to_bigquery_spark.operators.joins import asof_join, interval_join
from unity_to_bigquery_spark.operators.windows import sessionize, topk_per_group

__all__ = ["asof_join", "interval_join", "sessionize", "topk_per_group"]
