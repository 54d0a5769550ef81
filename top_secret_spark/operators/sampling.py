"""Deterministic sampling operators for training-data curation.

A 100-TB corpus is rarely trained on whole: language/source rebalancing,
held-out splits, and debug subsamples all need sampling that is
(a) exactly reproducible across runs, partitionings, and cluster sizes,
(b) map-only — no shuffle, no per-partition RNG state, and
(c) recomputable by any other engine auditing the pipeline.

``DataFrame.sample()`` fails (a) whenever the partitioning changes
(per-partition XORShift) and (c) always.  Instead we hash the ROW KEY
into [0, 1) with pure integer arithmetic — xor-fold the 63-bit key to
31 bits, then Knuth multiplicative mixing mod 2^32 — so the decision is
a property of the row, not of execution layout, and a DuckDB oracle can
recompute it exactly (q41).  Division by 2^32 is exact in binary
floating point, so the threshold comparison is bit-identical across
engines.  Not cryptographic: adequate avalanche for threshold sampling,
not for adversarial inputs.

The reference has no sampling surface; this is a driver-mandated
LLM-training-data operator (SURVEY §2.7).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH_MULT = 2654435761  # floor(2^32 / golden ratio), Knuth TAOCP 6.4
_M32 = 2**32
_MASK31 = 2**31 - 1


def sample_u_col(key: Column, seed: int = 0) -> Column:
    """Deterministic uniform-ish u in [0, 1) from an integer key column.

    xor-fold to 31 bits keeps the multiply inside bigint range under
    ANSI mode: (2^31 - 1) * KNUTH_MULT ≈ 5.7e18 < 2^63 - 1.

    A NULL key hashes as key 0 rather than propagating NULL: a NULL
    comparison would silently drop the row from every sample AND every
    stratum (even at fraction 1.0) while ``with_split`` routed it to
    'train' — silent, inconsistent row loss.  Coalescing gives all three
    operators one deterministic, auditable decision for null-keyed rows
    (they share key 0's fate); repair ids upstream if NULL keys carry
    real volume."""
    k = (
        F.coalesce(key.cast("bigint"), F.lit(0).cast("bigint"))
        .bitwiseXOR(F.lit(seed).cast("bigint"))
    )
    folded = F.shiftright(k, 31).bitwiseXOR(k).bitwiseAND(F.lit(_MASK31))
    return F.pmod(folded * F.lit(KNUTH_MULT), F.lit(_M32)) / F.lit(float(_M32))


def _check_fraction(fraction: float, name: str = "fraction") -> None:
    if not (0.0 <= fraction <= 1.0):
        raise ValueError(f"{name} must be in [0, 1], got {fraction}")


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — same rows every
    run regardless of partitioning.  Different ``seed`` values give
    independent samples over the same corpus."""
    _check_fraction(fraction)
    return df.filter(sample_u_col(F.col(key_col), seed) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str,
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample an overrepresented
    language) — one map-only filter, no shuffle: the per-row threshold
    is a CASE over ``strata_col``, compiled at plan time."""
    for k, v in fractions.items():
        _check_fraction(v, f"fractions[{k!r}]")
    _check_fraction(default_fraction, "default_fraction")
    thresh = F.lit(default_fraction)
    for value, fr in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == F.lit(value), F.lit(fr)).otherwise(
            thresh
        )
    return df.filter(sample_u_col(F.col(key_col), seed) < thresh)


def with_split(
    df: DataFrame,
    holdout_fraction: float = 0.01,
    key_col: str = "doc_id",
    seed: int = 0,
    col_name: str = "split",
) -> DataFrame:
    """Disjoint train/holdout assignment as a column: every row gets
    exactly one of 'train'/'holdout', stable across runs — the property
    an eval split must have so no holdout document ever leaks into a
    later training run."""
    _check_fraction(holdout_fraction, "holdout_fraction")
    u = sample_u_col(F.col(key_col), seed)
    return df.withColumn(
        col_name,
        F.when(u < F.lit(holdout_fraction), F.lit("holdout")).otherwise(
            F.lit("train")
        ),
    )
