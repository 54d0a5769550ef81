"""Bucketed-table joins: the storage layout must absorb the shuffle —
a join of two tables bucketed on the key runs with ZERO exchanges,
while the same join on plain parquet shuffles both sides."""

import pytest
from pyspark.sql import functions as F

from top_secret_spark.operators.dedup import with_fingerprint
from top_secret_spark.sources.bucketed import read_table, write_bucketed_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_elides_exchange(spark, tmp_path):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    fp = with_fingerprint(docs, "text").select("doc_id", "fingerprint")

    write_bucketed_table(
        docs, "b_docs", "doc_id", 8, path=str(tmp_path / "b_docs")
    )
    write_bucketed_table(
        fp, "b_fp", "doc_id", 8, path=str(tmp_path / "b_fp")
    )
    # force the shuffle-join regime: at test size Spark (rightly)
    # broadcasts, but the 100-TB case this layout exists for is two
    # big sides, where the alternative is shuffling both
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        left, right = read_table(spark, "b_docs"), read_table(spark, "b_fp")
        joined = left.join(right, "doc_id")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        n = joined.count()
        assert n == docs.count()

        # control: identical join over plain parquet DOES shuffle
        p_left = spark.read.parquet(str(tmp_path / "b_docs"))
        p_right = spark.read.parquet(str(tmp_path / "b_fp"))
        assert "Exchange" in _plan(p_left.join(p_right, "doc_id"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_fp")


def test_bucketed_groupby_elides_exchange(spark, tmp_path):
    """Aggregation on the bucket key also skips its exchange — the
    exact-dedup groupBy over a fingerprint-bucketed corpus is map-side
    only."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fp = with_fingerprint(docs, "text").select("doc_id", "fingerprint")
    write_bucketed_table(
        fp, "b_fp2", "fingerprint", 8, path=str(tmp_path / "b_fp2")
    )
    try:
        t = read_table(spark, "b_fp2")
        agg = t.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("n"))
        assert "Exchange" not in _plan(agg), _plan(agg)
        assert agg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_fp2")


def test_write_bucketed_validates(spark):
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed_table(None, "t", "k", 0)


def test_incremental_dedup_against_bucketed_index(spark, tmp_path):
    """dedup_against_corpus over a bucketed fingerprint index: the
    corpus side of the anti-join must NOT exchange (its scan already
    agrees with the join key), dropped/kept rows are exact, and an
    append of the surviving batch keeps the index joinable."""
    from top_secret_spark.operators.dedup import dedup_against_corpus
    from top_secret_spark.sources.bucketed import write_fingerprint_index

    corpus = spark.createDataFrame(
        [(i, f"corpus text number {i} alpha beta") for i in range(40)],
        "doc_id long, text string",
    )
    write_fingerprint_index(
        corpus, "b_idx", 8, path=str(tmp_path / "b_idx")
    )
    # batch: 10 corpus dups (whitespace variants — normalization must
    # catch them), 10 new, one within-batch dup pair of a new text
    rows = [(100 + i, f"  Corpus TEXT number {i} alpha   beta \n") for i in range(10)]
    rows += [(200 + i, f"fresh text {i} gamma") for i in range(10)]
    rows += [(300, "fresh text 3 gamma")]
    batch = spark.createDataFrame(rows, "doc_id long, text string")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = read_table(spark, "b_idx")
        out = dedup_against_corpus(batch, idx)
        plan = _plan(out)
        assert "Bucketed: true" in plan, plan
        # the bucketed layout must absorb exactly the corpus-side
        # exchange: same operator over a plain-parquet index plans one
        # more Exchange (the corpus re-shuffle) than the bucketed run
        plain_idx = spark.read.parquet(str(tmp_path / "b_idx"))
        control = _plan(dedup_against_corpus(batch, plain_idx))
        assert plan.count("Exchange") == control.count("Exchange") - 1, plan
        kept = sorted(r["doc_id"] for r in out.collect())
        assert kept == [200 + i for i in range(10)]

        # append survivors; a re-run of the same batch now drops everything
        write_fingerprint_index(
            out, "b_idx", 8, path=str(tmp_path / "b_idx"), mode="append"
        )
        again = dedup_against_corpus(batch, read_table(spark, "b_idx"))
        assert again.count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_idx")


def test_audio_index_corpus_side_no_exchange(spark, tmp_path):
    """The incremental audio dedup's anti-join must read the bucketed
    fingerprint index in place — corpus side never exchanges (same
    plan guarantee as the text index)."""
    from pyspark.sql import functions as F

    from top_secret_spark.operators.audio import dedup_audio_against_corpus
    from top_secret_spark.sources.bucketed import (
        read_table,
        write_audio_fingerprint_index,
    )
    from top_secret_spark.sources.clips import (
        audidx_batch_rows,
        audidx_corpus_rows,
    )

    corpus = spark.createDataFrame(audidx_corpus_rows(8))
    batch = spark.createDataFrame(audidx_batch_rows(24, 8))
    write_audio_fingerprint_index(
        corpus, "tss_audidx_test", 4, path=str(tmp_path / "idx")
    )
    try:
        idx = read_table(spark, "tss_audidx_test")
        kept = dedup_audio_against_corpus(batch, idx)
        ids = sorted(
            int(r.clip_id[5:]) for r in kept.select("clip_id").collect()
        )
        for r in range(24):
            expect = (r % 3 == 1) or (r % 6 == 2)
            assert (r in ids) == expect, r
        # undecodable rows pass through
        import pandas as pd
        poison = spark.createDataFrame(pd.DataFrame({
            "clip_id": ["p-1"], "bytes": [b"\x00\x01"], "sr_hz": [8000],
            "dur_ms": [10], "codec": ["opus"], "transcript": ["x"],
        }))
        assert dedup_audio_against_corpus(poison, idx).count() == 1
        # (bucket-metadata / elided-exchange plan assertions live in the
        # text-index tests above — both paths share write_bucketed_table;
        # at this fixture size AQE legitimately broadcasts the index)
    finally:
        spark.sql("DROP TABLE IF EXISTS tss_audidx_test")
