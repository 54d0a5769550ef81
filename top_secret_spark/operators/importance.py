"""Data-selection importance weighting (DSIR-style) — pure Catalyst.

Implements the hashed n-gram importance-resampling score of Xie et al.,
"Data Selection for Language Models via Importance Resampling"
(NeurIPS 2023): fit two bag-of-hashed-ngrams unigram models — one on a
TARGET sample (the distribution you want more of) and one on the RAW
corpus — and score every raw document by its log-likelihood ratio
log p_target(doc) − log p_raw(doc).  Documents that look like the
target score positive; off-distribution documents score negative; the
score feeds ``deterministic_sample``-style keep rules or top-fraction
selection.

Scale shape (the part that matters at 100 TB):

- Feature hashing bounds BOTH models at ``dim`` buckets regardless of
  corpus size, so the model-fit aggregations shuffle at most one
  (bucket, partial-count) row per bucket per mapper — never tokens.
- The fitted log-ratio table is ≤ ``dim`` rows → broadcast to the
  scoring join; scoring is explode (map-side) → broadcast hash join →
  one partial-aggregated groupBy(id) shuffle.  Zero Python anywhere:
  tokenization, hashing (xxhash64), and the log-ratio arithmetic are
  all Catalyst expressions inside whole-stage codegen.

No counterpart in the reference (a PII-scrub gem); this is one of the
training-data-pipeline operators the task brief adds on top of
SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_analysis import ngrams_from_words, words_col


def hashed_bucket_col(term: Column, dim: int) -> Column:
    """term → stable feature-hash bucket in [0, dim): pmod(xxhash64)."""
    return F.pmod(F.xxhash64(term), F.lit(dim)).cast("int")


def hashed_term_counts(
    df: DataFrame, text_col: str = "text", dim: int = 4096, n: int = 1
) -> DataFrame:
    """(bucket, count) over the hashed word n-grams of ``text_col`` —
    at most ``dim`` output rows whatever the corpus size."""
    words = df.select(words_col(text_col).alias("_words"))
    return (
        words.select(
            F.explode(ngrams_from_words(F.col("_words"), n)).alias("term")
        )
        .select(hashed_bucket_col(F.col("term"), dim).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def importance_weights(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str = "text",
    dim: int = 4096,
    n: int = 1,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit the per-bucket log-likelihood-ratio table → (bucket, weight).

    weight[b] = ln((ct[b]+α)/(T+α·dim)) − ln((cr[b]+α)/(R+α·dim))
    with ct/cr the target/raw bucket counts and T/R their totals —
    add-α-smoothed hashed unigram models, so unseen buckets get a
    finite strongly-negative weight instead of −inf.  Both count tables
    are ≤ dim rows; the two totals are scalar aggregates (bounded
    driver collect, same convention as the ANN query vectors)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    tc = hashed_term_counts(target_df, text_col, dim, n)
    rc = hashed_term_counts(raw_df, text_col, dim, n)
    t_total = tc.agg(F.sum("count")).collect()[0][0] or 0
    r_total = rc.agg(F.sum("count")).collect()[0][0] or 0
    joined = tc.withColumnRenamed("count", "ct").join(
        rc.withColumnRenamed("count", "cr"), "bucket", "full_outer"
    )
    ct = F.coalesce(F.col("ct"), F.lit(0)).cast("double")
    cr = F.coalesce(F.col("cr"), F.lit(0)).cast("double")
    t_den = float(t_total) + alpha * dim
    r_den = float(r_total) + alpha * dim
    weight = (
        F.log((ct + F.lit(alpha)) / F.lit(t_den))
        - F.log((cr + F.lit(alpha)) / F.lit(r_den))
    )
    return joined.select("bucket", weight.alias("weight"))


def with_importance_weight(
    df: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    n: int = 1,
    out_col: str = "importance",
) -> DataFrame:
    """Score every document: sum of its hashed-ngram bucket weights
    (the doc's log-likelihood ratio under the two fitted models).

    explode_outer keeps token-free docs (empty/NULL text) in the
    output at score 0.0; the weights table (≤ dim rows) is broadcast
    into the scoring join, whose left side carries only (id, bucket)
    pairs — never text.  The scores rebuild onto the original columns
    with one co-partitioned id join (the same rebuild shape as
    ``dedup_lines``); callers that only need (id, score) can aggregate
    the exploded side themselves and skip that join."""
    words = df.select(F.col(id_col), words_col(text_col).alias("_words"))
    scored = (
        words.select(
            F.col(id_col),
            F.explode_outer(ngrams_from_words(F.col("_words"), n)).alias(
                "term"
            ),
        )
        .select(
            F.col(id_col),
            hashed_bucket_col(F.col("term"), dim).alias("bucket"),
        )
        .join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col)
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias(out_col))
    )
    return df.join(scored, id_col, "left")
