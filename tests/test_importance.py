"""DSIR-style importance weighting (operators/importance.py)."""

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_importance_identical_models_score_zero(spark):
    """target == raw → every bucket weight is exactly 0 → every doc
    scores exactly 0 (both models are the same smoothed distribution)."""
    from top_secret_spark.operators.importance import (
        importance_weights,
        with_importance_weight,
    )

    docs = _docs(spark, [(i, f"tok{i % 5} tok{i % 3}") for i in range(30)])
    w = importance_weights(docs, docs, dim=512)
    assert all(r["weight"] == 0.0 for r in w.collect())
    scored = with_importance_weight(docs, w, dim=512)
    assert all(r["importance"] == 0.0 for r in scored.collect())


def test_importance_planted_classes_sign_and_edges(spark):
    """Target-vocab docs score strictly positive, off-vocab strictly
    negative; empty/NULL-text docs stay in the output at exactly 0.0;
    untouched columns survive the rebuild join."""
    from top_secret_spark.operators.importance import (
        importance_weights,
        with_importance_weight,
    )

    rows = [(i, "apple banana cherry" if i % 2 == 0 else "zebra quartz xylo",
             f"tag{i}") for i in range(40)]
    rows += [(100, "", "empty"), (101, None, "null")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, tag string")
    target = docs.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 100))
    w = importance_weights(target, docs, dim=2048)
    got = {r["doc_id"]: r for r in with_importance_weight(docs, w, dim=2048).collect()}
    for i in range(40):
        if i % 2 == 0:
            assert got[i]["importance"] > 0, i
        else:
            assert got[i]["importance"] < 0, i
    assert got[100]["importance"] == 0.0
    assert got[101]["importance"] == 0.0
    assert got[7]["tag"] == "tag7" and len(got) == 42


def test_importance_score_is_tokenwise_additive(spark):
    """score(doc) = Σ weight[bucket(token)] exactly, so a doc that
    repeats one token twice scores exactly 2× the single-token doc —
    same bucket, no float surprises (one addition)."""
    from top_secret_spark.operators.importance import (
        importance_weights,
        with_importance_weight,
    )

    corpus = _docs(spark, [(0, "apple"), (1, "apple apple"), (2, "banana")])
    target = corpus.filter(F.col("doc_id") < 2)
    w = importance_weights(target, corpus, dim=1024)
    got = {r["doc_id"]: r["importance"]
           for r in with_importance_weight(corpus, w, dim=1024).collect()}
    assert got[1] == pytest.approx(2 * got[0], abs=0.0)


def test_importance_partition_independent_and_alpha_guard(spark):
    """Scores are a deterministic function of the corpus — physical
    layout must not change them; alpha <= 0 raises."""
    from top_secret_spark.operators.importance import (
        importance_weights,
        with_importance_weight,
    )

    rows = [(i, f"w{i % 7} w{i % 4} w{i % 11}") for i in range(50)]
    docs = _docs(spark, rows)
    target = docs.filter(F.col("doc_id") % 3 == 0)

    def run(parts):
        d = docs.repartition(parts)
        w = importance_weights(target.repartition(parts), d, dim=256)
        return {r["doc_id"]: r["importance"]
                for r in with_importance_weight(d, w, dim=256).collect()}

    assert run(1) == run(13)
    with pytest.raises(ValueError, match="alpha"):
        importance_weights(target, docs, alpha=0.0)


# --- distributed n-gram LM fit (operators/lm.py) --------------------------------


def test_fit_ngram_counts_equals_local_counting(spark):
    """The distributed fit (partials -> groupBy sum) must equal one
    local count_ngrams pass over the same texts, bucket for bucket."""
    import numpy as np

    from top_secret_spark.kernel.perplexity import count_ngrams, normalize
    from top_secret_spark.operators.lm import (
        collect_ngram_tables,
        fit_ngram_counts,
    )

    texts = [
        "the quick brown fox", "jumps over the lazy dog",
        "pack my box with five dozen jugs", "", None,
        "the quick brown fox",  # duplicate weight counts twice
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).repartition(4)
    got = collect_ngram_tables(fit_ngram_counts(df))
    want = count_ngrams([normalize(t or "") for t in texts])
    for g, w in zip(got[:3], want):
        assert np.array_equal(g, w.astype(np.float32))
    assert got[3] == float(want[0].sum())


def test_fit_partials_are_partition_invariant(spark):
    import numpy as np

    from top_secret_spark.operators.lm import (
        collect_ngram_tables,
        fit_ngram_counts,
    )

    texts = [(i, f"sentence number {i} about foxes and dogs")
             for i in range(40)]
    a = collect_ngram_tables(fit_ngram_counts(
        spark.createDataFrame(texts, ["doc_id", "text"]).repartition(1)))
    b = collect_ngram_tables(fit_ngram_counts(
        spark.createDataFrame(texts, ["doc_id", "text"]).repartition(13)))
    for x, y in zip(a[:3], b[:3]):
        assert np.array_equal(x, y)


def test_with_perplexity_from_separates_domains(spark):
    from pyspark.sql import functions as F

    from top_secret_spark.operators.lm import (
        collect_ngram_tables,
        fit_ngram_counts,
        with_perplexity_from,
    )

    corpus = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog")
         for i in range(20)],
        ["doc_id", "text"],
    )
    model = collect_ngram_tables(fit_ngram_counts(corpus))
    ev = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "zzz qqq www xxx vvv")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["ppl_fit"]
           for r in with_perplexity_from(ev, model).collect()}
    assert got[0] < 10.0 < 50.0 < got[1]


def test_fit_ngram_counts_rejects_unbounded_buckets(spark):
    import pytest

    from top_secret_spark.operators.lm import fit_ngram_counts

    df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="buckets"):
        fit_ngram_counts(df, buckets=1 << 21)


def test_collect_ngram_tables_width_rides_with_fit(spark):
    """Regression: the fit's hash space is stamped on the counts frame,
    so collect assembles tables of exactly the fit width — a
    non-default fit width cannot silently mis-hash scoring."""
    from top_secret_spark.operators.lm import (
        collect_ngram_tables,
        fit_ngram_counts,
    )

    df = spark.createDataFrame(
        [(0, "the quick brown fox")], ["doc_id", "text"]
    )
    model = collect_ngram_tables(fit_ngram_counts(df, buckets=4096))
    assert len(model[0]) == 4096
