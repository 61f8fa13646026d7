"""Text-analysis operators for LLM data pipelines (BASELINE.json north
star): tokenization stats, quality scoring, language ID, document
fingerprinting. All pure JVM-side column expressions (no Python UDFs)
— at 100 TB these run inside whole-stage codegen on the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Tiny per-language stopword lists for the heuristic language-ID vote.
STOPWORDS = {
    "en": ["the", "of", "and", "to", "in"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "et", "les", "des", "un"],
}

# BPE-ish pre-tokenizer: word | single digit | single non-space symbol.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

PUNCT_PATTERN = r"[.,!?;:]"


def words_col(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def whitespace_token_count(text: Column | str = "text") -> Column:
    return F.size(words_col(text))


def bpe_ish_token_count(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def punct_count(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(PUNCT_PATTERN))


def quality_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Attach standard quality-scoring features: lengths, token counts,
    punctuation density, stopword ratio, mean word length.
    Ratios are fixed-point (×1e6 floored longs) for engine portability.
    """
    w = words_col(text)
    n_words = F.size(w)
    stop_hits = F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in STOPWORDS["en"]])))
    return (
        df.withColumn("n_chars", F.length(text))
        .withColumn("n_words", n_words)
        .withColumn("n_bpe_tokens", bpe_ish_token_count(text))
        .withColumn(
            "punct_per_kchar",
            F.floor(punct_count(text) * 1000.0 / F.length(text) + 0.5).cast("long"),
        )
        .withColumn(
            "stopword_ratio6",
            F.floor(stop_hits.cast("double") * 1000000.0 / n_words + 0.5).cast("long"),
        )
        .withColumn(
            "mean_word_len6",
            F.floor(
                (F.length(text) - n_words + 1).cast("double") * 1000000.0 / n_words + 0.5
            ).cast("long"),
        )
    )


def lang_id(text: Column | str = "text") -> Column:
    """Heuristic language ID: CJK script check, else stopword vote with
    fixed precedence (zh > es > de > fr > en default). Deterministic,
    pure expression — the production path would swap in a model UDF.
    """
    c = F.col(text) if isinstance(text, str) else text
    w = words_col(c)
    votes = {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in sw])))
        for lang, sw in STOPWORDS.items()
    }
    en = votes["en"]
    return (
        F.when(c.rlike("[一-鿿]"), "zh")
        .when((votes["es"] > en) & (votes["es"] >= votes["de"]) & (votes["es"] >= votes["fr"]), "es")
        .when((votes["de"] > en) & (votes["de"] >= votes["fr"]), "de")
        .when(votes["fr"] > en, "fr")
        .otherwise("en")
    )


def fingerprint(text: Column | str = "text") -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    word set (the classic key-collapse fingerprint for clustering dups).
    """
    return F.md5(F.array_join(F.array_sort(F.array_distinct(words_col(text))), " "))
