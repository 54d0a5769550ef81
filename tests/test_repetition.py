"""Gopher repetition signals: Catalyst run-length scans vs a direct
Counter-based Python reference, threshold firing order, degenerate
docs, and the zero-shuffle plan contract."""

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from top_secret_spark.operators.repetition import (
    GOPHER_THRESHOLDS,
    repetition_drop_reason_col,
    with_repetition_signals,
)

TOP_NS = (2, 3, 4)
DUP_NS = (5, 6, 7, 8, 9, 10)


def py_signals(t):
    """Independent Counter-based reference of the documented
    definitions (module doc of operators/repetition.py)."""
    t = t or ""
    words = [w for w in t.lower().split() if w]
    lines = t.split("\n")
    content = " ".join(words)
    out = {}
    c = Counter(lines)
    tot_l, tot_lc = len(lines), sum(len(ln) for ln in lines)
    out["dup_line_frac"] = (
        sum(v - 1 for v in c.values() if v >= 2) / tot_l if tot_l else 0.0
    )
    out["dup_line_char_frac"] = (
        sum((v - 1) * len(k) for k, v in c.items() if v >= 2) / tot_lc
        if tot_lc else 0.0
    )
    for n in TOP_NS:
        g = Counter(" ".join(words[i:i + n])
                    for i in range(len(words) - n + 1))
        m = max((v * len(k) for k, v in g.items()), default=0)
        out[f"top_ngram_char_frac_{n}"] = m / len(content) if content else 0.0
    for n in DUP_NS:
        g = Counter(" ".join(words[i:i + n])
                    for i in range(len(words) - n + 1))
        m = sum(v * len(k) for k, v in g.items() if v >= 2)
        out[f"dup_ngram_char_frac_{n}"] = m / len(content) if content else 0.0
    return out


WORDS = ["the", "cat", "nav", "spam", "a", "xylophone"]


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(WORDS + ["\n"]), min_size=0, max_size=40
        ).map(lambda ws: " ".join(ws).replace(" \n ", "\n")),
        min_size=1, max_size=6,
    )
)
@settings(max_examples=12, deadline=None)
def test_signals_match_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict()
           for r in with_repetition_signals(df).collect()}
    for i, t in enumerate(docs):
        for k, v in py_signals(t).items():
            assert got[i][k] == pytest.approx(v, abs=1e-12), (i, k, t)


def test_degenerate_docs(spark):
    """Empty, NULL, and single-word docs read 0.0 everywhere and keep."""
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "word")], "doc_id long, text string"
    )
    rows = with_repetition_signals(df).withColumn(
        "reason", repetition_drop_reason_col()
    ).collect()
    for r in rows:
        if r["doc_id"] == 2:
            # one word: no 2+-grams, no duplicate lines, top fracs 0
            assert r["top_ngram_char_frac_2"] == 0.0
        assert r["dup_line_frac"] == 0.0
        assert r["dup_ngram_char_frac_5"] == 0.0
        assert r["reason"] is None


def test_threshold_firing_order(spark):
    """A doc over BOTH the line and n-gram thresholds reports the
    line reason (published table order); reasons are prefixed and
    NULL means keep."""
    nav = "\n".join(["nav bar line"] * 8 + ["unique closer"])
    # 60 distinct words, no repeated n-grams; long enough that no single
    # n-gram covers a threshold-crossing char fraction (Gopher's top-n
    # thresholds presume docs past a min word count — tiny docs always
    # fire them, which is why the suite gates length upstream)
    vocab = [f"word{i}unique{i * 7}" for i in range(60)]
    clean = "\n".join(" ".join(vocab[i:i + 10]) for i in range(0, 60, 10))
    df = spark.createDataFrame(
        [(0, nav), (1, clean)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["reason"] for r in with_repetition_signals(df)
           .withColumn("reason", repetition_drop_reason_col()).collect()}
    assert got[0] == "repetition_dup_line_frac"
    assert got[1] is None


def test_custom_thresholds_and_validation(spark):
    with pytest.raises(ValueError, match="n-gram"):
        with_repetition_signals(
            spark.createDataFrame([(1, "x")], "doc_id long, text string"),
            top_ns=(0,),
        )
    # custom thresholds: only the named signals are checked
    df = spark.createDataFrame([(0, "a a a a")], "doc_id long, text string")
    r = with_repetition_signals(df).select(
        repetition_drop_reason_col({"dup_line_frac": 0.5}).alias("x")
    ).collect()[0]
    assert r["x"] is None  # top_2gram would fire, but isn't checked


def test_gopher_threshold_table_is_the_published_one():
    assert GOPHER_THRESHOLDS["dup_line_frac"] == 0.30
    assert GOPHER_THRESHOLDS["top_ngram_char_frac_2"] == 0.20
    assert GOPHER_THRESHOLDS["dup_ngram_char_frac_10"] == 0.10
    assert list(GOPHER_THRESHOLDS)[0] == "dup_line_frac"


def test_plan_is_map_only(spark):
    """The signals must never leave the row: no Exchange, no Python
    eval node — Projects over the scan only."""
    df = spark.createDataFrame(
        [(0, "a b c a b c")], "doc_id long, text string"
    )
    plan = (
        with_repetition_signals(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan
