"""Corpus distribution drift (PSI) between two snapshots.

A curation pipeline that re-crawls and re-filters continuously needs to
know when a new snapshot's DISTRIBUTION moved, not just which rows
changed (q81's membership diff answers that): a codec rollout that
shifts duration, a filter change that shifts length, a crawler bug that
drops a language.  The standard monitor is the Population Stability
Index over a fixed bucketing:

    PSI = sum_b (p_b - q_b) * ln(p_b / q_b)

with p the baseline share and q the candidate share of bucket b
(conventional read: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).

Scale shape: one groupBy per side over the CASE-bucketed value — the
only shuffles, on a key with at most ``len(edges)+1`` values, partial-
aggregated map-side to a handful of rows — then all PSI arithmetic runs
on the <= B-row joined frame.  Nothing else moves; at 10^12 rows the
cost is two scans.  Laplace smoothing (+0.5 per bucket) keeps empty
buckets finite, so a vanished class reads as a large-but-finite
contribution instead of infinity.

No reference counterpart (the reference is a single-corpus scrubber);
this is part of the training-data operations layer SURVEY.md §2.7 adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, edges: list[float]) -> Column:
    """Bucket index for ``col`` under explicit ascending ``edges``:
    bucket i covers [edges[i], edges[i+1]); values below edges[0] land
    in bucket 0, values >= edges[-1] in bucket len(edges)-1.  NULL
    values get their OWN bucket, -1: a drift monitor must SURFACE a
    crawler regression that starts emitting NULLs, and letting NULLs
    fall through the comparisons into the top bucket would instead
    report 'long documents increased' — the silent misread this class
    exists to catch.  Coalesce upstream when NULL genuinely means a
    known value (q103 coalesces length to 0).  Explicit edges keep the
    monitor deterministic and oracle-recomputable; at scale, take them
    once from the BASELINE snapshot's quantiles and pin them in config
    (re-deriving edges per run would hide drift)."""
    if len(edges) < 2 or sorted(edges) != list(edges):
        raise ValueError("edges must be >= 2 ascending values")
    # default = the LAST bucket id (len(edges)-2): >= edges[-1] clamps
    # into the top bucket, mirroring the oracle's ELSE arm
    expr = F.lit(len(edges) - 2)
    for i in range(len(edges) - 1, 0, -1):
        expr = F.when(col < F.lit(float(edges[i])), F.lit(i - 1)).otherwise(expr)
    return F.when(col.isNull(), F.lit(-1)).otherwise(expr).cast("int")


def psi_drift(
    before: DataFrame,
    after: DataFrame,
    value_col: Column | str,
    edges: list[float],
) -> DataFrame:
    """Per-bucket PSI decomposition between two snapshots: one row per
    bucket with ``n_before`` / ``n_after`` (exact counts), smoothed
    shares, and the bucket's rounded PSI contribution plus the rounded
    total (same on every row — the scalar verdict without a second
    pass).  ``value_col`` may be any Catalyst expression (a column, a
    ``length(text)``, a computed signal)."""
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    # value buckets plus the NULL bucket (-1) — always in the spine so
    # a missing-field regression reads as ITS OWN bucket moving, and
    # the smoothing denominator is snapshot-independent
    n_buckets = len(edges)
    b = bucketize(col, edges).alias("bucket")
    cb = before.groupBy(b).agg(F.count(F.lit(1)).alias("n_before"))
    ca = after.groupBy(b).agg(F.count(F.lit(1)).alias("n_after"))
    # <= n_buckets rows per side from here on — everything is tiny.
    # The explicit bucket spine keeps both-sides-empty buckets in the
    # output: under smoothing their contribution is small but NONZERO
    # whenever the totals differ, and silently dropping them would
    # understate the index.
    spine = before.sparkSession.range(-1, n_buckets - 1).select(
        F.col("id").cast("int").alias("bucket")
    )
    j = (
        spine.join(cb, "bucket", "left")
        .join(ca, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_before", F.lit(0)).alias("n_before"),
            F.coalesce("n_after", F.lit(0)).alias("n_after"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy()  # B rows: a global window here is free
    p = (F.col("n_before") + 0.5) / (
        F.sum("n_before").over(w) + 0.5 * n_buckets
    )
    q = (F.col("n_after") + 0.5) / (
        F.sum("n_after").over(w) + 0.5 * n_buckets
    )
    contrib = (p - q) * F.log(p / q)
    out = j.select(
        "bucket",
        "n_before",
        "n_after",
        F.round(contrib, 6).alias("psi_contrib"),
        F.round(F.sum(contrib).over(w), 6).alias("psi_total"),
    )
    return out.orderBy("bucket")
