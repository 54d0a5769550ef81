"""Sequence packing for training-data preparation.

GPT-style packing concatenates documents in a fixed order and chops the
stream every ``max_tokens`` — every training sequence is exactly full,
nothing pads.  The primitive underneath is a GLOBAL prefix sum of token
counts in document order, which naive Spark writes as a window over ONE
partition (`Window.orderBy(id)` with no partitionBy — a single task
holding the whole corpus; the classic scale-killer).  This module does
it as the textbook two-phase distributed prefix sum instead:

  1. range-partition by the order column, exclusive prefix sum WITHIN
     each partition (a window over a task-sized group);
  2. per-partition totals — ONE ROW PER PARTITION, thousands at most —
     come back to the driver, their exclusive running sum is the
     partition base offset, and a broadcast join adds base + local.

The only driver-side data is the per-partition totals (bounded by the
partition count, not the data), and the result is partitioning-
independent: a global prefix sum is a pure function of (order, value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_offset(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
) -> DataFrame:
    """Append ``out_col`` = exclusive global prefix sum of ``value_col``
    in ``order_col`` order (the first row gets 0).  Two-phase
    distributed prefix sum — no global single-partition window; see the
    module docstring for the shape.  ``order_col`` must be unique;
    ``value_col`` NULLs count as 0."""
    val = F.coalesce(F.col(value_col), F.lit(0)).cast("bigint")
    # localCheckpoint FREEZES the range partitioning: the per-partition
    # totals job below and the final join are separate actions over this
    # lineage, and RangePartitioner samples its boundaries — without the
    # checkpoint a recomputation could draw different boundaries and the
    # _pid each row saw in phase 1 would not be the _pid it joins its
    # base offset on in phase 2
    d = (
        df.repartitionByRange(F.col(order_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = d.withColumn("_local", F.coalesce(F.sum(val).over(w), F.lit(0)))
    # one row per partition — bounded by partition count, never by data
    totals = sorted(
        d.groupBy("_pid").agg(F.sum(val).alias("_t")).collect(),
        key=lambda r: r["_pid"],
    )
    base, running = [], 0
    for r in totals:
        base.append((r["_pid"], running))
        running += int(r["_t"] or 0)
    base_df = d.sparkSession.createDataFrame(base, "_pid int, _base long")
    return (
        d.join(F.broadcast(base_df), "_pid")
        .withColumn(out_col, F.col("_base") + F.col("_local"))
        .drop("_pid", "_local", "_base")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    token_col: str = "n_tokens",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign every document to its GPT-style training pack: documents
    concatenate in ``order_col`` order and the stream is chopped every
    ``max_tokens``.  Appends ``offset`` (global token offset of the
    doc's first token), ``pack_id`` (the pack that first token lands
    in) and ``pack_offset`` (position within that pack).  A document
    whose tokens straddle a boundary starts in ``pack_id`` and spills
    into the next — exactly the concat-then-chop semantics GPT-family
    training uses (no padding, sequences always full).

    The global offsets come from :func:`with_global_offset`; everything
    after is pure Catalyst arithmetic."""
    if max_tokens <= 0:
        raise ValueError("pack_sequences: max_tokens must be positive")
    out = with_global_offset(df, order_col, token_col)
    # `div`, not `/`: Spark's `/` is double division, which loses
    # integer exactness once offsets pass 2^52 (~4.5e15 tokens — inside
    # the 10^12-doc regime this module targets) and would disagree with
    # the exact bigint `%` below at pack boundaries
    return out.withColumn(
        "pack_id", F.expr(f"offset div {int(max_tokens)}")
    ).withColumn(
        "pack_offset", F.col("offset") % F.lit(int(max_tokens))
    )


def shard_by_size(
    df: DataFrame,
    shard_bytes: int,
    order_col: str = "clip_id",
    size_col: str | None = None,
    payload_col: str = "bytes",
) -> DataFrame:
    """WebDataset-style size-balanced shard assignment: rows
    concatenate in ``order_col`` order and a new shard starts every
    ``shard_bytes`` of cumulative payload.  Appends ``shard_id`` and
    ``shard_offset`` (byte position of the row's first byte within its
    shard).

    A 100-TB corpus ships to trainers as thousands of roughly
    equal-SIZE shards (tar/tfrecord files), not equal-COUNT ones — a
    count split puts 1000 ten-second clips and 1000 one-hour clips in
    "equal" shards and starves/chokes readers.  Assignment is
    offset-based (a row straddling a boundary belongs to the shard its
    first byte lands in), so each shard overflows by at most one row's
    payload — the same no-padding semantics as :func:`pack_sequences`,
    and deterministic: a pure function of (order, sizes), independent
    of partitioning or cluster size.

    ``size_col`` names a precomputed size column; by default the size
    is ``length(payload_col)`` (NULL payloads count 0 and ride along).
    The global running total comes from :func:`with_global_offset`
    (two-phase distributed prefix sum — no single-partition window);
    everything after is exact bigint Catalyst arithmetic.

    The prefix sum runs on a NARROW (order, size) projection — the
    payload column never rides the range shuffle and never lands in the
    localCheckpoint that freezes the range partitioning; the multi-KB
    payload crosses exactly one exchange, in the key-hash join that
    brings ``shard_id`` back.  At 100 TB the difference is the whole
    corpus materialized to executor disk vs a few GB of (key, size)
    pairs.
    """
    if shard_bytes <= 0:
        raise ValueError("shard_by_size: shard_bytes must be positive")
    sz = "_shard_sz"
    sized = df.select(
        F.col(order_col),
        (F.col(size_col) if size_col is not None
         else F.length(F.col(payload_col))).alias(sz),
    )
    out = with_global_offset(sized, order_col, sz, out_col="_shard_cum")
    # `div`, not `/`: double division loses bigint exactness past 2^52
    # cumulative bytes (~4.5 PB is out of range, but 2^52 B = 4.5 TB is
    # not) and would disagree with the exact `%` at shard boundaries
    assign = (
        out.withColumn("shard_id", F.expr(f"_shard_cum div {int(shard_bytes)}"))
        .withColumn("shard_offset", F.col("_shard_cum") % F.lit(int(shard_bytes)))
        .select(order_col, "shard_id", "shard_offset")
    )
    return df.join(assign, order_col).select(
        *df.columns, "shard_id", "shard_offset"
    )
