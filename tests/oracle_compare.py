"""Canonicalized Spark-vs-DuckDB result comparison.

Mirrors the driver's t2 check: sort columns by name, order-insensitive
row compare. Numeric columns are rounded to 9dp to absorb float-repr
noise beyond the query-level rounding; everything else compares as
strings (None normalized).
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pandas as pd


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        r = round(v, 9)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return repr(r)
    if isinstance(v, (datetime, pd.Timestamp)):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, (int, bool, str)):
        return str(v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon_cell(v.item())
    return str(v)


def canonicalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.rename(columns={c: c.lower() for c in pdf.columns})
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    pdf = pdf.astype(object).where(pd.notnull(pdf), None)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def assert_match(spark_df, duck_rel, name: str = "") -> None:
    s_pdf = spark_df.toPandas()
    d_pdf = duck_rel.df()
    s_cols = sorted(c.lower() for c in s_pdf.columns)
    d_cols = sorted(c.lower() for c in d_pdf.columns)
    assert s_cols == d_cols, f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    s_rows = canonicalize(s_pdf)
    d_rows = canonicalize(d_pdf)
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}\n"
        f"spark head: {s_rows[:3]}\nduck head: {d_rows[:3]}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows (cols={s_cols}); first 3: "
        + "\n".join(f"  spark={a}\n  duck ={b}" for _, a, b in mismatches[:3])
    )
