"""Structured Streaming support.

The reference has no streaming surface, and the north rule asks for
batch-with-checkpoints rather than streams (SURVEY.md §2.5) — but the
fused pipeline stage is stateless per row, so it lifts onto Structured
Streaming for free.  This module provides that lift for ingest-time
filtering (e.g. scrubbing clips as they land) with watermarked per-window
keep/drop counters as the monitoring stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kernel.filters import DEFAULT_CONFIG, ScrubConfig
from .kernel.quality import DEFAULT_THRESHOLDS, QualityThresholds
from .operators.fused import run_pipeline_fused


def scrub_stream(
    stream: DataFrame,
    scrub_config: ScrubConfig = DEFAULT_CONFIG,
    thresholds: QualityThresholds = DEFAULT_THRESHOLDS,
    text_col: str = "transcript",
) -> DataFrame:
    """Apply the full quality-filter + scrub stage to a streaming frame.

    Stateless map — no watermark needed; works with any source/sink and
    exactly-once file/Delta sinks via checkpointLocation."""
    if not stream.isStreaming:
        raise ValueError("scrub_stream expects a streaming DataFrame")
    return run_pipeline_fused(stream, scrub_config, thresholds, text_col=text_col)


def keep_drop_counters(
    scrubbed_stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Windowed keep/drop counters with late-data tolerance — the
    monitoring side-stream (per-partition counters are the batch
    equivalent, sources/checkpoint.py)."""
    return (
        scrubbed_stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.coalesce(F.col("drop_reason"), F.lit("keep")).alias("drop_reason"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "drop_reason",
            "n",
        )
    )
