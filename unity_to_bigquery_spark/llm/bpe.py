"""Byte-pair-encoding tokenizer TRAINING and application — the
tokenizer-construction step of an LLM data pipeline (Sennrich et al.
2016, arXiv:1508.07909 — public paper), Spark-first.

Scale design (100 TB of text):
- Training runs on the WORD-FREQUENCY table, not the corpus: the
  corpus is scanned ONCE into (word, count) — after that every merge
  round's cost is VOCABULARY-sized (distinct words), independent of
  corpus size. This is the original algorithm's structure and the only
  shape that survives web scale (the corpus has 1e12 tokens; the
  distinct-word table has 1e7 rows).
- Each round: explode symbol sequences to count-weighted adjacent
  pairs (codegen), one hash agg on the pair, a deterministic top-1
  (max count, lexicographic tiebreak — reproducible across cluster
  layouts), ONE driver-side row collect (the chosen pair), then a
  vectorized Arrow pass rewriting the vocab's symbol arrays
  (non-overlapping left-to-right merge, the spec's semantics).
- Iterative-loop hygiene per CLAUDE.md rule 5: the vocab persists
  each round and the previous round's cache is released after the
  next materializes (the LSH/connected-components discipline).
- Application (:func:`apply_bpe`) is a single mapInPandas over the
  corpus: greedy merges in learned priority order per word — an
  embarrassingly parallel pass at any scale.

Determinism: ties in pair frequency break lexicographically on
(left, right); given the same corpus the merge list is unique, which
is what makes the DIFFERENTIAL test against a pure-Python reference
(tests/test_llm.py) exact.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from unity_to_bigquery_spark.llm.text import words_col

END = "</w>"  # end-of-word sentinel (Sennrich): keeps merges word-internal


def word_freq(docs: DataFrame, text: str = "text") -> DataFrame:
    """Corpus -> (word, n) — the ONE corpus-sized pass of training."""
    return (
        docs.select(F.explode(words_col(text)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_vocab(freq: DataFrame) -> DataFrame:
    """(word, n) -> (n, syms): character symbols + the end sentinel."""
    return freq.select(
        "n",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(END))
        ).alias("syms"),
    )


def _merge_round_pdf(left: str, right: str):
    """Arrow-batched non-overlapping left-to-right merge of one pair."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for syms in pdf["syms"]:
                s = list(syms)
                merged = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(s[i])
                        i += 1
                out.append(merged)
            yield pd.DataFrame({"n": pdf["n"], "syms": out})

    return fn


def train_bpe(
    docs: DataFrame,
    n_merges: int = 40,
    text: str = "text",
    max_vocab: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges: ONE distributed corpus pass into
    the word-frequency table, a distributed top-``max_vocab`` cap
    (deterministic count-desc/word-asc order), one BOUNDED collect,
    then the merge loop driver-side over the capped vocab — the
    pq_codebooks recipe: at web scale the corpus scan is the
    distributed cost and tokenizer training is vocabulary-sized
    single-node work (every production BPE trainer's shape). For a
    vocabulary that genuinely cannot fit one node, use
    :func:`train_bpe_distributed` — same merges, every round
    cluster-side."""
    freq = (
        word_freq(docs, text)
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_vocab)
        .collect()  # bounded: <= max_vocab (word, count) rows
    )
    table = {tuple(list(r.w) + [END]): r.n for r in freq}
    return _merge_loop(table, n_merges)


def train_bpe_distributed(
    docs: DataFrame, n_merges: int = 40, text: str = "text"
) -> list[tuple[str, str]]:
    """The all-cluster trainer (for vocabularies beyond one node):
    per round, count-weighted adjacent pairs from the vocab table, a
    deterministic distributed argmax, ONE single-row collect, and an
    Arrow pass rewriting the symbol arrays. Identical merges to
    :func:`train_bpe` (differential-tested); ~one Spark job per round,
    so wall is round-count-bound at small scale — use it when the
    vocab, not the round count, is the problem."""
    spark = docs.sparkSession
    vocab = _initial_vocab(word_freq(docs, text)).persist()
    vocab.count()  # materialize before the loop (rule 5)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # adjacent pairs: zip the array against its own shift —
        # interpreted higher-order lambda, but over the VOCAB (distinct
        # words), never the corpus, so per-round volume is bounded
        pairs = vocab.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()  # bounded: exactly one row per round
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        new_vocab = vocab.mapInPandas(
            _merge_round_pdf(left, right), "n BIGINT, syms ARRAY<STRING>"
        ).persist()
        new_vocab.count()  # materialize, then drop the old round's cache
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return merges


def _merge_loop(
    freq: dict[tuple[str, ...], int], n_merges: int
) -> list[tuple[str, str]]:
    """The BPE merge loop over a (symbol-tuple -> count) table:
    deterministic argmax (count desc, pair lexicographic), stop when
    no pair repeats."""
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in freq.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < 2:
            break
        left, right = best[0]
        merges.append((left, right))
        new_freq: dict[tuple[str, ...], int] = {}
        for syms, n in freq.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_freq[key] = new_freq.get(key, 0) + n
        freq = new_freq
    return merges


def train_bpe_reference(texts: list[str], n_merges: int = 40) -> list[tuple[str, str]]:
    """Pure-Python end-to-end reference (the differential oracle):
    counts words locally, then the shared merge loop."""
    freq: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                key = tuple(list(w) + [END])
                freq[key] = freq.get(key, 0) + 1
    return _merge_loop(freq, n_merges)


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge list: per word, apply
    merges in priority order (each merge non-overlapping
    left-to-right). Returns (id, token) rows — one embarrassingly
    parallel mapInPandas pass; the merge list broadcasts with the
    closure (vocabulary-sized)."""
    merge_list = list(merges)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, toks = [], []
            for did, txt in zip(pdf[id_col], pdf[text]):
                for w in str(txt).split(" "):
                    if not w:
                        continue
                    s = list(w) + [END]
                    for left, right in merge_list:
                        merged, i = [], 0
                        while i < len(s):
                            if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                                merged.append(left + right)
                                i += 2
                            else:
                                merged.append(s[i])
                                i += 1
                        s = merged
                    for tok in s:
                        ids.append(did)
                        toks.append(tok)
            yield pd.DataFrame({id_col: ids, "token": toks})

    return docs.select(id_col, text).mapInPandas(
        fn, f"{id_col} BIGINT, token STRING"
    )
