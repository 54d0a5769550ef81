"""Heuristic keep/drop as pure Catalyst column expressions.

Mirrors kernel/quality.py exactly (the kernel is the oracle the tests
compare against).  Everything here is JVM-side whole-stage-codegen'd —
no Python: length, word count, symbol/digit ratios via regexp_count,
duplicate-line fraction via split + array_distinct.  The three signals
that need a model or O(n) counting (lang, ppl, top_bigram_frac) arrive
as columns from operators/features.py.

[north-rule] stage — BASELINE.json north_star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernel.quality import DEFAULT_THRESHOLDS, QualityThresholds


def n_chars_col(text) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(F.coalesce(c, F.lit("")))


def n_words_col(text) -> Column:
    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def symbol_ratio_col(text) -> Column:
    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    n = F.length(c)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n - F.regexp_count(c, F.lit(r"[A-Za-z0-9\s]"))) / n
    )


def digit_ratio_col(text) -> Column:
    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    n = F.length(c)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.regexp_count(c, F.lit("[0-9]")) / n
    )


def dup_line_frac_col(text) -> Column:
    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    lines = F.filter(F.split(c, "\n"), lambda x: F.trim(x) != "")
    n = F.size(lines)
    return F.when(n < 2, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(lines)) / n
    )


def toxicity_col(text) -> Column:
    """Toxic-term matches per word ([north-rule] toxicity stage) — the
    wordlist alternation uses only ASCII letters + \\b, which agree
    across Python re.ASCII (kernel), Java regex (here), and RE2 (DuckDB
    oracle)."""
    from ..kernel.toxicity import TOXICITY_PATTERN

    c = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    return F.regexp_count(F.lower(c), F.lit(TOXICITY_PATTERN)) / F.greatest(
        n_words_col(c), F.lit(1)
    )


def with_quality_signals(df: DataFrame, text_col: str = "transcript") -> DataFrame:
    """Add the Catalyst-computable quality signal columns."""
    return df.withColumns(
        {
            "n_chars": n_chars_col(text_col),
            "n_words": n_words_col(text_col),
            "symbol_ratio": symbol_ratio_col(text_col),
            "digit_ratio": digit_ratio_col(text_col),
            "dup_line_frac": dup_line_frac_col(text_col),
            "toxicity": toxicity_col(text_col),
        }
    )


def drop_reason_col(th: QualityThresholds = DEFAULT_THRESHOLDS) -> Column:
    """First failing rule in kernel priority order (quality.py REASONS).

    Derived from :func:`rule_conditions` — ONE rule table drives both
    production filtering (first-failing here) and the independent-firing
    audit (:func:`quality_rule_audit`), so the two can never drift.

    Expects columns: n_chars, n_words, symbol_ratio, digit_ratio,
    dup_line_frac, top_bigram_frac, toxicity, lang, lang_conf, ppl."""
    conds = rule_conditions(th)
    expr = F.when(conds[0][1], conds[0][0])
    for nm, c in conds[1:]:
        expr = expr.when(c, nm)
    return expr


def with_keep_drop(
    df: DataFrame, th: QualityThresholds = DEFAULT_THRESHOLDS
) -> DataFrame:
    """Add keep: boolean and drop_reason: string columns."""
    return df.withColumn("drop_reason", drop_reason_col(th)).withColumn(
        "keep", F.col("drop_reason").isNull()
    )


def rule_conditions(
    th: QualityThresholds = DEFAULT_THRESHOLDS,
    available: set | None = None,
) -> list:
    """(rule_name, fired_condition) pairs in kernel priority order —
    each rule evaluated INDEPENDENTLY (no first-failing short-circuit).

    The model-gated rules (repetition / lang / lang_conf / perplexity)
    are included only when their feature columns are ``available`` —
    the audit composes with or without the features stage."""
    conds = [
        ("too_short", F.col("n_chars") < th.min_chars),
        ("too_long", F.col("n_chars") > th.max_chars),
        ("too_few_words", F.col("n_words") < th.min_words),
        ("symbol_ratio", F.col("symbol_ratio") > th.max_symbol_ratio),
        ("digit_ratio", F.col("digit_ratio") > th.max_digit_ratio),
        ("dup_lines", F.col("dup_line_frac") > th.max_dup_line_frac),
        ("repetition", F.col("top_bigram_frac") > th.max_top_bigram_frac),
        ("toxicity", F.col("toxicity") > th.max_toxicity),
        ("lang", ~F.col("lang").isin(*th.allowed_langs)),
        ("lang_conf", F.col("lang_conf") < th.min_lang_conf),
        ("perplexity", F.col("ppl") > th.max_ppl),
    ]
    needs = {
        "repetition": "top_bigram_frac",
        "lang": "lang",
        "lang_conf": "lang_conf",
        "perplexity": "ppl",
    }
    if available is not None:
        conds = [
            (nm, c) for nm, c in conds
            if needs.get(nm, "n_chars") in available
        ]
    return conds


def quality_rule_audit(
    df: DataFrame,
    th: QualityThresholds = DEFAULT_THRESHOLDS,
    text_col: str = "transcript",
) -> DataFrame:
    """Per-rule firing AUDIT: how many rows each rule set catches.

    ``drop_reason`` reports only the FIRST failing rule, which is what
    production filtering needs but exactly what threshold tuning cannot
    use: a rule that only ever fires together with earlier rules is
    dead weight, and one that fires alone at high volume deserves a
    second look before it deletes corpus mass.  Here every rule is
    evaluated independently and rows are grouped by the full fired SET.

    Output: (rules_fired: comma-joined names in priority order, '' =
    clean row; n_rules; n) — one row per observed combination.  Scale
    shape: the signals are pure codegen'd Catalyst; the only shuffle is
    a groupBy on a short string whose cardinality is bounded by 2^n_rules
    (in practice a handful), with map-side partial aggregation.
    """
    sig = with_quality_signals(df, text_col=text_col)
    conds = rule_conditions(th, available=set(sig.columns))
    fired = F.concat_ws(
        ",", *[F.when(c, F.lit(nm)) for nm, c in conds]
    )
    out = sig.groupBy(fired.alias("rules_fired")).agg(
        F.count(F.lit(1)).alias("n")
    )
    n_rules = F.when(F.col("rules_fired") == "", F.lit(0)).otherwise(
        F.size(F.split(F.col("rules_fired"), ","))
    )
    return out.select(
        "rules_fired", n_rules.cast("int").alias("n_rules"), "n"
    )


def lang_consistency_col(
    declared_col: str = "lang_declared",
    lang_col: str = "lang",
    conf_col: str = "lang_conf",
    min_conf: float = 0.5,
) -> Column:
    """Metadata-vs-content language audit: NULL for a consistent row,
    ``lang_metadata_missing`` when the declared language is absent,
    ``lang_mismatch`` when the langid stage CONFIDENTLY (>=
    ``min_conf``) detects a different language than the metadata
    claims — the wrong-corpus / mislabeled-upload check run before
    language-targeted sampling trusts the label.  A low-confidence
    detection never condemns the metadata (short or mixed transcripts
    keep their declared label; the quality gate owns gibberish).

    Pure Catalyst over :func:`~top_secret_spark.operators.features.
    with_text_features` columns — at 10^12 rows the audit adds a
    codegen'd CASE to a pipeline already paying the langid pass."""
    return (
        F.when(F.col(declared_col).isNull(), F.lit("lang_metadata_missing"))
        .when(
            (F.col(conf_col) >= min_conf)
            & (F.col(lang_col) != F.col(declared_col)),
            F.lit("lang_mismatch"),
        )
        .otherwise(F.lit(None))
    )
