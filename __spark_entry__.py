"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query: the full quality-filter + PII-scrub
                 pipeline over a deterministic synthetic clips table
                 derived at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-data ops); each callable (spark, sf_dir) → DF.
oracle_sql()   — matching DuckDB SQL per query.  Every query carries an
                 oracle; the approximate ANN queries (q21/q29) gate
                 derived constants (self-hit rank + recall@k floor)
                 rather than the approximate result set itself.

Implementations live in top_secret_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from top_secret_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline (langid + perplexity + heuristics + scrub)
    over clips derived from sf0.001 documents; returns the output
    projection (clip_id, keep, drop_reason, lang, lang_conf, ppl,
    scrubbed, mapping)."""
    from pyspark.sql import functions as F

    from top_secret_spark.pipeline import run_pipeline
    from top_secret_spark.queries import _derived, _prep

    _prep(spark)
    clips = _derived(spark, "/root/testdata/sf0.001").withColumn(
        "clip_id", F.col("doc_id").cast("string")
    )
    out = run_pipeline(clips)
    return out.select(
        "clip_id", "keep", "drop_reason", "lang", "lang_conf", "ppl",
        "scrubbed", "mapping",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
