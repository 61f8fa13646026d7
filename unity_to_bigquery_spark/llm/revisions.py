"""Revision diffing — wiki/code-history corpora store near-identical
document revisions, and training pipelines keep one representative
plus per-revision CHANGE statistics (what was inserted or deleted)
rather than every copy. The engine implements the real Myers O(ND)
greedy shortest-edit-script algorithm (the public 1986 'An O(ND)
Difference Algorithm' construction: the furthest-reaching D-path per
diagonal k held in a V array, snakes following equal elements) —
the same algorithm under `git diff` — and derives insert/delete/
common counts from the minimal D:

    common = (len(a) + len(b) - D) / 2
    dels   = len(a) - common
    ins    = len(b) - common

The unit test differentials D against the textbook LCS dynamic
program over random token sequences, so minimality (not just A-vs-B
plausibility) is what's checked.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def myers_distance(a: Sequence, b: Sequence) -> int:
    """Length D of the shortest edit script (insertions+deletions)."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return n + m
    max_d = n + m
    # V[k] = furthest x on diagonal k (offset by max_d)
    v = [0] * (2 * max_d + 1)
    for d in range(max_d + 1):
        for k in range(-d, d + 1, 2):
            if k == -d or (k != d and v[max_d + k - 1] < v[max_d + k + 1]):
                x = v[max_d + k + 1]  # down: insertion
            else:
                x = v[max_d + k - 1] + 1  # right: deletion
            y = x - k
            while x < n and y < m and a[x] == b[y]:  # snake
                x += 1
                y += 1
            v[max_d + k] = x
            if x >= n and y >= m:
                return d
    raise AssertionError("unreachable: D is bounded by n+m")


def diff_counts(a: Sequence, b: Sequence) -> dict:
    d = myers_distance(a, b)
    common = (len(a) + len(b) - d) // 2
    return {
        "edit_distance": d,
        "lcs_len": common,
        "n_del": len(a) - common,
        "n_ins": len(b) - common,
    }


def make_revision(doc_id: int, n_chars: int) -> tuple[list[str], list[str]]:
    """Base of n = n_chars%20+20 DISTINCT tokens; the revision deletes
    every 5th and inserts a fresh token after every 3rd survivor —
    all tokens distinct, so the planted script IS the minimal one and
    the counts are closed-form."""
    n = n_chars % 20 + 20
    base = [f"a{doc_id}_{i}" for i in range(n)]
    rev: list[str] = []
    kept = 0
    for i, tok in enumerate(base):
        if i % 5 == 0:
            continue  # deletion
        rev.append(tok)
        kept += 1
        if kept % 3 == 0:
            rev.append(f"n{doc_id}_{kept}")  # insertion
    return base, rev


def revision_diff_stats(docs: DataFrame) -> DataFrame:
    """Synthesize + Myers-diff in ONE mapInPandas stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                base, rev = make_revision(int(doc_id), int(n_chars))
                c = diff_counts(base, rev)
                rows.append(
                    (
                        int(doc_id), len(base), len(rev), c["n_del"],
                        c["n_ins"], c["lcs_len"], c["edit_distance"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_base", "n_rev", "n_del", "n_ins",
                    "lcs_len", "edit_distance",
                ],
            )

    return docs.select("doc_id", "n_chars").mapInPandas(
        batches,
        "doc_id BIGINT, n_base INT, n_rev INT, n_del INT, n_ins INT, "
        "lcs_len INT, edit_distance INT",
    )
