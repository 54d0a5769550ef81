"""Fused single-pass pipeline stage: ONE Arrow crossing per batch.

The modular pipeline (quality.py + features.py + scrub.py) crosses the
JVM↔Python boundary twice and computes signals JVM-side.  That layout is
the right default when the heavy work is Catalyst-expressible — but this
pipeline's gating stages (langid, perplexity, scrub) are irreducibly
Python/numpy, so every extra stage just adds an Arrow round-trip of the
full transcript column.  The fused stage computes everything in one
crossing, using the SAME kernel functions the oracles test, and scrubs
only rows that pass keep/drop:

    transcript → (signals, lang, lang_conf, ppl, keep, drop_reason,
                  scrubbed, mapping)

Semantics are identical to the modular path by construction (both call
the kernel; the kernel is pinned by the golden corpus + DuckDB oracles).
At cluster scale the fused stage halves Python-boundary traffic and
leaves the plan scan → one ArrowEvalPython → project, still fully
pushdown/pruning-friendly on the input side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..kernel.filters import DEFAULT_CONFIG, ScrubConfig
from ..kernel.quality import DEFAULT_THRESHOLDS, QualityThresholds
from .scrub import MAPPING_TYPE

FUSED_TYPE = T.StructType(
    [
        T.StructField("n_chars", T.IntegerType(), False),
        T.StructField("n_words", T.IntegerType(), False),
        T.StructField("symbol_ratio", T.DoubleType(), False),
        T.StructField("digit_ratio", T.DoubleType(), False),
        T.StructField("dup_line_frac", T.DoubleType(), False),
        T.StructField("top_bigram_frac", T.DoubleType(), False),
        T.StructField("toxicity", T.DoubleType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("lang_conf", T.DoubleType(), False),
        T.StructField("ppl", T.DoubleType(), False),
        T.StructField("keep", T.BooleanType(), False),
        T.StructField("drop_reason", T.StringType(), True),
        T.StructField("scrubbed", T.StringType(), True),
        T.StructField("mapping", MAPPING_TYPE, True),
    ]
)

FUSED_FIELDS = [f.name for f in FUSED_TYPE.fields]


def make_fused_udf(
    scrub_config: ScrubConfig = DEFAULT_CONFIG,
    thresholds: QualityThresholds = DEFAULT_THRESHOLDS,
    scrub_dropped: bool = False,
    counters=None,
):
    scrub_config.all_filters()  # plan-time label validation (op 9)

    @pandas_udf(FUSED_TYPE)
    def fused(texts: pd.Series) -> pd.DataFrame:
        from ..kernel.langid import detect_batch
        from ..kernel.perplexity import perplexity_batch
        from ..kernel.quality import (
            digit_ratio,
            dup_line_frac,
            keep_drop_from_signals,
            symbol_ratio,
            top_bigram_frac,
            toxicity_score,
            word_count,
        )
        from ..kernel.scrub import scrub_batch

        t = texts.tolist()
        langs, confs = detect_batch(t)
        ppls = perplexity_batch(t)

        n = len(t)
        rows = {k: [None] * n for k in FUSED_FIELDS}
        to_scrub: list[int] = []
        for i in range(n):
            text = t[i] or ""
            rows["n_chars"][i] = len(text)
            rows["n_words"][i] = word_count(text)
            rows["symbol_ratio"][i] = symbol_ratio(text)
            rows["digit_ratio"][i] = digit_ratio(text)
            rows["dup_line_frac"][i] = dup_line_frac(text)
            rows["top_bigram_frac"][i] = top_bigram_frac(text)
            rows["toxicity"][i] = toxicity_score(text)
            rows["lang"][i] = langs[i]
            rows["lang_conf"][i] = float(confs[i])
            rows["ppl"][i] = float(ppls[i])
            keep, reason = keep_drop_from_signals(
                rows["n_chars"][i],
                rows["n_words"][i],
                rows["symbol_ratio"][i],
                rows["digit_ratio"][i],
                rows["dup_line_frac"][i],
                rows["top_bigram_frac"][i],
                rows["toxicity"][i],
                langs[i],
                float(confs[i]),
                float(ppls[i]),
                thresholds,
            )
            rows["keep"][i] = keep
            rows["drop_reason"][i] = reason
            if keep or scrub_dropped:
                to_scrub.append(i)

        outputs, mappings = scrub_batch([t[i] for i in to_scrub], None, scrub_config)
        for j, i in enumerate(to_scrub):
            rows["scrubbed"][i] = outputs[j]
            rows["mapping"][i] = [
                {"key": k, "value": v} for k, v in mappings[j]
            ]
        if counters is not None:
            counters.rows_in.add(n)
            counters.rows_kept.add(sum(1 for k in rows["keep"] if k))
            counters.rows_scrubbed.add(len(to_scrub))
        return pd.DataFrame(rows)

    return fused


def run_pipeline_fused(
    clips: DataFrame,
    scrub_config: ScrubConfig = DEFAULT_CONFIG,
    thresholds: QualityThresholds = DEFAULT_THRESHOLDS,
    scrub_dropped: bool = False,
    text_col: str = "transcript",
    counters=None,
) -> DataFrame:
    udf = make_fused_udf(scrub_config, thresholds, scrub_dropped, counters)
    df = clips.withColumn("_f", udf(F.col(text_col)))
    return df.withColumns(
        {name: F.col(f"_f.{name}") for name in FUSED_FIELDS}
    ).drop("_f")
