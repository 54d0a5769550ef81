"""Bucketed-table writes for shuffle-free co-located joins.

At 100 TB the repeated joins in a curation pipeline — near-dup pairs
back to text, lineage to stage output, incremental batches to the
corpus fingerprint index — all hash-shuffle BOTH sides every run unless
the storage layout already agrees with the join key.  Writing the
corpus bucketed (and sorted) by the join key moves that shuffle into
the one-time write: every later equi-join on the key becomes a
zero-exchange sort-merge join over co-located buckets, and Spark skips
even the sort when ``sortBy`` matched.

Bucketed tables need the session catalog (``saveAsTable``); the path
option keeps the data at an explicit location so the table is portable
across sessions pointing at the same warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_table(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed AND sorted by ``key``.

    ``n_buckets`` must match on both sides of a later join for the
    exchange to be elided; pick it once per corpus (e.g. 4x the target
    cluster's cores) and keep it stable across stages."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_fingerprint_index(
    df: DataFrame,
    table: str,
    n_buckets: int,
    path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Materialize a corpus content-fingerprint index bucketed by the
    fingerprint: ``(fingerprint, id)`` pairs, 16 bytes a row, laid out
    so membership joins against it (incremental dedup's left-anti, see
    :func:`~top_secret_spark.operators.dedup.dedup_against_corpus`)
    never exchange the corpus side.  ``mode="append"`` adds a new
    batch's fingerprints after it passes dedup — buckets stay aligned
    because the bucket function is a pure function of the key.  The
    source's ``id_col`` is stored under the FIXED name ``id`` so
    batches with differently-named ids append into one index."""
    from ..operators.dedup import with_fingerprint

    fp = with_fingerprint(df, text_col).select(
        "fingerprint", df[id_col].cast("long").alias("id")
    )
    write_bucketed_table(fp, table, "fingerprint", n_buckets, path=path, mode=mode)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet(path)`` would lose it and re-shuffle)."""
    return spark.table(table)


def write_audio_fingerprint_index(
    df: DataFrame,
    table: str,
    n_buckets: int,
    path: str | None = None,
    id_col: str = "clip_id",
    n_frames: int = 32,
    mode: str = "overwrite",
) -> None:
    """Audio twin of :func:`write_fingerprint_index`: materialize a
    corpus index of TEMPO-ROBUST envelope fingerprints
    (``operators.audio.with_tempo_fingerprint``) bucketed by the
    fingerprint — (fingerprint, id) pairs, 8+N bytes a row, so the
    incremental audio dedup's anti-join (:func:`~top_secret_spark.
    operators.audio.dedup_audio_against_corpus`) reads corpus buckets
    in place and only the new crawl batch shuffles.  Rows whose audio
    could not be fingerprinted (``fp_ok`` false) are NOT indexed —
    unverifiable content never blocks a future upload.  ``id`` is
    stored as a string (clip ids are opaque)."""
    from ..operators.audio import with_tempo_fingerprint

    fp = (
        with_tempo_fingerprint(df, n_frames=n_frames)
        .filter(F.col("fp_ok"))
        .select(
            F.col("tempo_fp").alias("fingerprint"),
            F.col(id_col).cast("string").alias("id"),
        )
    )
    write_bucketed_table(fp, table, "fingerprint", n_buckets, path=path, mode=mode)
