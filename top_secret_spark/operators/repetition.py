"""Gopher/MassiveText-style repetition signals — the canonical
quality-filter family this tier is named for (Rae et al. 2021,
appendix A1.1; reused by RedPajama/Dolma/FineWeb): fraction of a
document's characters locked up in repeated lines and repeated word
n-grams.  A crawl document that is 40% nav-bar lines or one 6-gram
pasted fifty times is boilerplate, not language — these signals are
what the published keep/drop thresholds fire on.

Exact definitions (deterministic, oracle-recomputable):

- ``dup_line_frac``        — line occurrences BEYOND the first of each
  distinct line / total lines (lines = ``split(text, '\\n')``, exact
  string identity, empties kept).
- ``dup_line_char_frac``   — characters in those beyond-first
  occurrences / total line characters (newlines excluded).
- ``top_ngram_char_frac_n`` (n ∈ top_ns) — max over distinct word
  n-grams of count × length(gram) / content chars, where content chars
  = length of the space-joined lowercased token stream.  This is the
  "most covering" n-gram — deterministic with no tie rule, unlike
  "most frequent" (which is ambiguous under count ties).
- ``dup_ngram_char_frac_n`` (n ∈ dup_ns) — sum over distinct n-grams
  occurring ≥ 2 times of count × length(gram) / content chars.
  Overlapping occurrences are both counted (the standard published
  approximation — fractions can exceed 1 on degenerate text).

SCALE DESIGN — zero shuffle.  These are per-document signals, so they
must never leave the row: each one is ``array_sort`` over the per-doc
n-gram array followed by ONE ``aggregate`` run-length scan (duplicates
are adjacent after sorting), all Catalyst higher-order expressions —
JVM-side, map-only, no Exchange, no Python.  The alternative
(explode → groupBy(doc_id, term) → join back) would shuffle every
token instance of a 100 TB corpus to compute a row-local number.

Reference: thoughtbot/top_secret has no repetition stage (its scope is
redaction, spec/filters at lib/top_secret/filters.rb); this family is
the training-data-pipeline extension the north rule's heuristic
keep/drop stage draws from.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_analysis import ngrams_from_words, words_col

# MassiveText table A1 drop thresholds (Rae et al. 2021).
GOPHER_THRESHOLDS: dict[str, float] = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_ngram_char_frac_2": 0.20,
    "top_ngram_char_frac_3": 0.18,
    "top_ngram_char_frac_4": 0.16,
    "dup_ngram_char_frac_5": 0.15,
    "dup_ngram_char_frac_6": 0.14,
    "dup_ngram_char_frac_7": 0.13,
    "dup_ngram_char_frac_8": 0.12,
    "dup_ngram_char_frac_9": 0.11,
    "dup_ngram_char_frac_10": 0.10,
}

_LONG0 = "CAST(0 AS LONG)"


def _run_scan(sorted_arr: Column, beyond_first: bool) -> Column:
    """ONE linear pass over an already-sorted string array → struct
    (dup_mass long, top_mass long, dup_cnt long).

    Equal elements are adjacent after the sort, so a run-length scan
    sees every distinct value as one run of length ``run``.  A run
    closes when the next element differs (and once more at finish):

    - ``dup_mass`` += run × len   (or (run−1) × len when
      ``beyond_first`` — the line-dup convention) for runs with run ≥ 2
    - ``top_mass``  = max over ALL runs of run × len
    - ``dup_cnt``  += (run − 1) for runs with run ≥ 2

    The accumulator is a flat struct; every operation is a Catalyst
    expression — whole-stage-codegen'd, zero Python, zero shuffle."""
    init = F.expr(
        f"named_struct('prev', '', 'run', {_LONG0}, 'dup', {_LONG0}, "
        f"'top', {_LONG0}, 'cnt', {_LONG0})"
    )

    def close(acc):
        """Contributions of the run being closed (prev repeated `run`
        times).  run = 0 (initial) contributes nothing everywhere."""
        run, ln = acc["run"], F.length(acc["prev"]).cast("long")
        mult = (run - 1) if beyond_first else run
        dup = F.when(run >= 2, acc["dup"] + mult * ln).otherwise(acc["dup"])
        cnt = F.when(run >= 2, acc["cnt"] + (run - 1)).otherwise(acc["cnt"])
        top = F.greatest(acc["top"], run * ln)
        return dup, top, cnt

    def merge(acc, x):
        same = acc["prev"] == x
        dup, top, cnt = close(acc)
        one = F.lit(1).cast("long")
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + one).otherwise(one).alias("run"),
            F.when(same, acc["dup"]).otherwise(dup).alias("dup"),
            F.when(same, acc["top"]).otherwise(top).alias("top"),
            F.when(same, acc["cnt"]).otherwise(cnt).alias("cnt"),
        )

    def finish(acc):
        dup, top, cnt = close(acc)
        return F.struct(
            dup.alias("dup_mass"), top.alias("top_mass"),
            cnt.alias("dup_cnt"),
        )

    return F.aggregate(sorted_arr, init, merge, finish)


def _frac(mass: Column, total: Column) -> Column:
    """mass / total as ONE double division of two longs (bit-exact on
    any engine computing the same longs); 0.0 on empty docs."""
    return F.when(
        total > 0, mass.cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))


def with_repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Append the Gopher repetition-signal columns (module doc for the
    exact definitions): ``dup_line_frac``, ``dup_line_char_frac``,
    ``top_ngram_char_frac_{n}`` for n in ``top_ns``, and
    ``dup_ngram_char_frac_{n}`` for n in ``dup_ns``.

    Map-only: the words array and every per-n sorted-gram scan stay
    inside the row; the physical plan gains Projects only — no
    Exchange, no Python, at any corpus size.  The words array is
    materialized ONCE as an attribute before any higher-order lambda
    captures it (re-tokenization per element is the standard
    higher-order-function trap — see ``ngrams_from_words``)."""
    for n in (*top_ns, *dup_ns):
        if n < 1:
            raise ValueError(f"n-gram sizes must be >= 1, got {n}")
    words, lines = "_rep_words", "_rep_lines"
    out = df.withColumn(words, words_col(text_col)).withColumn(
        lines, F.split(F.coalesce(F.col(text_col), F.lit("")), "\n", -1)
    )

    w = F.col(words)
    content_chars = F.length(F.array_join(w, " ")).cast("long")
    line_scan = _run_scan(F.array_sort(F.col(lines)), beyond_first=True)
    line_chars = F.aggregate(
        F.col(lines), F.expr(_LONG0),
        lambda acc, x: acc + F.length(x).cast("long"),
    )
    out = (
        out.withColumn("_rep_line_scan", line_scan)
        .withColumn(
            "dup_line_frac",
            _frac(F.col("_rep_line_scan")["dup_cnt"],
                  F.size(F.col(lines)).cast("long")),
        )
        .withColumn(
            "dup_line_char_frac",
            _frac(F.col("_rep_line_scan")["dup_mass"], line_chars),
        )
    )
    for n in top_ns:
        scan = _run_scan(
            F.array_sort(ngrams_from_words(w, n)), beyond_first=False
        )
        out = out.withColumn(
            f"top_ngram_char_frac_{n}", _frac(scan["top_mass"], content_chars)
        )
    for n in dup_ns:
        scan = _run_scan(
            F.array_sort(ngrams_from_words(w, n)), beyond_first=False
        )
        out = out.withColumn(
            f"dup_ngram_char_frac_{n}", _frac(scan["dup_mass"], content_chars)
        )
    return out.drop(words, lines, "_rep_line_scan")


def repetition_drop_reason_col(
    thresholds: dict[str, float] | None = None,
) -> Column:
    """First firing Gopher threshold as a drop reason (NULL = keep),
    checked in ``GOPHER_THRESHOLDS`` insertion order — lines first,
    then top n-grams ascending, then dup n-grams ascending, matching
    the published table's order.  Compose over
    ``with_repetition_signals`` output."""
    th = GOPHER_THRESHOLDS if thresholds is None else thresholds
    reason = F.lit(None).cast("string")
    for name in reversed(list(th)):
        reason = F.when(
            F.col(name) > F.lit(float(th[name])), F.lit(f"repetition_{name}")
        ).otherwise(reason)
    return reason
