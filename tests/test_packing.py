"""Sequence packing / distributed prefix sum (operators/packing.py)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from top_secret_spark.operators.packing import (
    pack_sequences,
    with_global_offset,
)


def _reference_offsets(rows):
    """Sequential exclusive prefix sum over (id, value) pairs."""
    out, running = {}, 0
    for i, v in sorted(rows):
        out[i] = running
        running += v or 0
    return out


def test_global_offset_matches_sequential(spark):
    rows = [(i, (i * 7919) % 350 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = {r["doc_id"]: r["offset"]
           for r in with_global_offset(df, "doc_id", "n").collect()}
    assert got == _reference_offsets(rows)


def test_global_offset_partition_independent(spark):
    """A global prefix sum is a pure function of (order, value): the
    physical layout the frame arrives in must not matter."""
    rows = [(i, i % 97 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    a = {r["doc_id"]: r["offset"]
         for r in with_global_offset(df.repartition(1), "doc_id", "n").collect()}
    b = {r["doc_id"]: r["offset"]
         for r in with_global_offset(df.repartition(17), "doc_id", "n").collect()}
    assert a == b == _reference_offsets(rows)


def test_global_offset_equals_single_partition_window(spark):
    """Two-phase result == the naive Window.orderBy(no partitionBy)
    reference — the exact operator the two-phase shape replaces."""
    rows = [(i, (i * 31) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        r["doc_id"]: r["o"]
        for r in df.withColumn(
            "o", F.coalesce(F.sum("n").over(w), F.lit(0))
        ).collect()
    }
    got = {r["doc_id"]: r["offset"]
           for r in with_global_offset(df, "doc_id", "n").collect()}
    assert got == ref


def test_global_offset_null_values_count_zero(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 5)], "doc_id long, n long"
    )
    got = {r["doc_id"]: r["offset"]
           for r in with_global_offset(df, "doc_id", "n").collect()}
    assert got == {1: 0, 2: 10, 3: 10}


def test_pack_sequences_straddle_semantics(spark):
    """Concat-then-chop: a doc straddling a boundary starts in its
    offset's pack; packs are always full (no padding)."""
    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 60)], "doc_id long, n_tokens long"
    )
    got = {r["doc_id"]: (r["pack_id"], r["pack_offset"])
           for r in pack_sequences(df, max_tokens=100).collect()}
    assert got == {1: (0, 0), 2: (0, 60), 3: (1, 20)}
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(df, max_tokens=0)


def test_shard_by_size_matches_sequential_definition(spark):
    """Audio-payload sharding: shard boundaries every shard_bytes of
    cumulative payload in id order, independent of partitioning; each
    shard (except possibly the last) spans at least shard_bytes once its
    straddling row is counted."""
    from top_secret_spark.operators.packing import shard_by_size
    from top_secret_spark.sources.clips import clips_df

    clips = clips_df(spark, 150, with_audio=True)
    sh = shard_by_size(clips, 65536, order_col="clip_id").collect()
    rows = sorted(sh, key=lambda r: r.clip_id)
    cum = 0
    for r in rows:
        assert r.shard_id == cum // 65536, r.clip_id
        assert r.shard_offset == cum % 65536, r.clip_id
        cum += len(r.bytes) if r.bytes is not None else 0
    # partitioning independence
    again = shard_by_size(
        clips.repartition(7), 65536, order_col="clip_id"
    ).collect()
    assert {(r.clip_id, r.shard_id, r.shard_offset) for r in again} == {
        (r.clip_id, r.shard_id, r.shard_offset) for r in rows
    }
    with pytest.raises(ValueError, match="shard_bytes"):
        shard_by_size(clips, 0)


def test_shard_by_size_null_payload_and_size_col(spark):
    from pyspark.sql import functions as F

    from top_secret_spark.operators.packing import shard_by_size

    df = spark.createDataFrame(
        [(0, b"abc"), (1, None), (2, b"defg")], "clip_id long, bytes binary"
    )
    got = {r.clip_id: (r.shard_id, r.shard_offset)
           for r in shard_by_size(df, 4, order_col="clip_id").collect()}
    # NULL payload counts 0 bytes and rides along in place
    assert got == {0: (0, 0), 1: (0, 3), 2: (0, 3)}
    # explicit size column overrides payload length
    df2 = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 5)], "clip_id long, n_chars int"
    )
    got2 = {r.clip_id: r.shard_id for r in
            shard_by_size(df2, 6, order_col="clip_id",
                          size_col="n_chars").collect()}
    assert got2 == {0: 0, 1: 0, 2: 1}
