"""Dump ``explain("formatted")`` of declared queries' returned plans
(optimization rounds: the judge checks plan claims against these).

Usage: ``python tools/explain_dump.py <out_path> <query> [query ...]``
Each query's formatted plan is appended to ``<out_path>`` (one file per
query is the usual call shape). Runs the query function to OBTAIN the
DataFrame (demos commit state first), but does not execute the final
action beyond what the query body itself runs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unity_to_bigquery_spark.registry import all_queries  # noqa: E402
from unity_to_bigquery_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    with open(out_path, "w") as out:
        for name in names:
            df = registry[name].spark(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            out.write(f"== {name} (returned plan) ==\n")
            out.write(buf.getvalue())
            out.write("\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
