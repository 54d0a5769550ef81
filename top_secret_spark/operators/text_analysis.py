"""Text-analysis operators for training-data pipelines over `documents`.

All Catalyst column expressions where possible (token counting, quality
scoring); Python only where a model/counting loop is genuinely needed
(langid rides the features UDF; fingerprints are numpy in a pandas UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# A BPE-ish pre-tokenizer regex (GPT-2 style word/number/punct splitting,
# ASCII approximation) — used to approximate LLM token counts JVM-side.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def whitespace_token_count(text) -> Column:
    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text) -> Column:
    """Approximate LLM token count via regexp_count with a GPT-2-style
    pre-tokenizer pattern — pure Catalyst, no Python."""
    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def stopword_ratio(text) -> Column:
    """Fraction of words that are common English stopwords — a classic
    quality-scoring signal (C4/Gopher rules use the same idea)."""
    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    words = F.split(F.trim(F.lower(c)), r"\s+")
    stops = F.array(*[F.lit(w) for w in (
        "the", "a", "an", "and", "or", "of", "to", "in", "is", "was",
        "for", "on", "with", "as", "at", "by", "it", "that", "this")])
    n = F.size(words)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.size(F.array_intersect(words, stops)) / n
    )


def mean_word_length(text) -> Column:
    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    t = F.trim(c)
    words = F.split(t, r"\s+")
    return F.when(t == "", F.lit(0.0)).otherwise(
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
        / F.size(words)
    )


def quality_score(text) -> Column:
    """Composite heuristic quality score in [0,1] — Catalyst-only blend
    of stopword ratio, word-length sanity, and alpha density."""
    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    n = F.length(c)
    alpha_density = F.when(n == 0, F.lit(0.0)).otherwise(
        F.regexp_count(c, F.lit("[A-Za-z]")) / n
    )
    swr = stopword_ratio(c)
    mwl = mean_word_length(c)
    word_len_sanity = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    return F.round(
        0.4 * alpha_density + 0.4 * F.least(swr * F.lit(2.5), F.lit(1.0))
        + 0.2 * word_len_sanity,
        6,
    )


@pandas_udf(T.LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    """64-bit rolling-hash document fingerprint (FNV-1a over normalized
    text) — stable content identity for exact dedup and lineage."""
    from ..kernel.hashing import xxhash64_str

    normed = [" ".join((t or "").lower().split()) for t in texts.tolist()]
    return pd.Series(xxhash64_str(normed).astype("int64"))


def with_text_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumns(
        {
            "ws_tokens": whitespace_token_count(text_col),
            "bpe_tokens": bpe_ish_token_count(text_col),
            "stopword_ratio": F.round(stopword_ratio(text_col), 6),
            "mean_word_len": F.round(mean_word_length(text_col), 6),
            "quality_score": quality_score(text_col),
            "fingerprint": fingerprint_udf(F.col(text_col)),
        }
    )
