"""Per-stage checkpointing with bucket-granular lineage and resume.

[north-rule] — BASELINE.json north_star: "every stage checkpoints to
Iceberg with per-partition lineage and counters for resumable reruns".

Layout per stage (parquet fallback; Iceberg used when the runtime jars
are on the classpath — the sandbox has none, so the layout mirrors an
Iceberg table's partition spec):

    {root}/{stage}/data/bucket=<b>/part-*.parquet   output rows
    {root}/{stage}/lineage/part-*.parquet           (bucket, n_rows,
                                                     status, run_id)

Protocol:
  1. bucket the input by xxhash64(key) % n_buckets (content-based →
     stable across runs AND cluster sizes);
  2. read existing lineage; pending = all buckets − completed buckets;
  3. process ONLY pending buckets, write with dynamic partition
     overwrite (a re-run of a half-written bucket replaces it, never
     duplicates);
  4. append lineage rows (with per-bucket row counters) only AFTER the
     data write commits — crash between the two writes re-runs those
     buckets idempotently.

At 10^12 rows this is the unit of recovery: a failed executor loses a
task (Spark retries it), a failed JOB loses only its incomplete buckets.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _data_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "data")


def _lineage_path(root: str, stage: str) -> str:
    return os.path.join(root, stage, "lineage")


def _use_iceberg(spark: SparkSession, iceberg_table: str | None) -> bool:
    return iceberg_table is not None and iceberg_available(spark)


def _lineage_frame(
    spark: SparkSession, root: str, stage: str, iceberg_table: str | None
) -> DataFrame | None:
    if _use_iceberg(spark, iceberg_table):
        ltable = f"{iceberg_table}_lineage"
        if spark.catalog.tableExists(ltable):
            return spark.table(ltable)
        return None
    path = _lineage_path(root, stage)
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def completed_buckets(
    spark: SparkSession,
    root: str,
    stage: str,
    iceberg_table: str | None = None,
) -> set[int]:
    lineage = _lineage_frame(spark, root, stage, iceberg_table)
    if lineage is None:
        return set()
    rows = (
        lineage.filter(F.col("status") == "complete")
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r["bucket"] for r in rows}


def _iceberg_write_data(spark: SparkSession, out: DataFrame, table: str) -> str | None:
    """Create-or-overwrite the pending buckets of an Iceberg table and
    return the committed snapshot id (Iceberg's native lineage handle).

    First run creates the table partitioned by bucket; re-runs use
    ``overwritePartitions`` — Iceberg's dynamic partition overwrite —
    so a half-written bucket is atomically replaced, never duplicated
    (the same idempotence the parquet fallback gets from
    partitionOverwriteMode=dynamic, plus snapshot isolation)."""
    if spark.catalog.tableExists(table):
        out.writeTo(table).overwritePartitions()
    else:
        out.writeTo(table).using("iceberg").partitionedBy(F.col("bucket")).create()
    try:
        row = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return str(row[0][0]) if row else None
    except Exception:
        return None


def stage_lineage(
    spark: SparkSession,
    root: str,
    stage: str,
    iceberg_table: str | None = None,
) -> DataFrame:
    lineage = _lineage_frame(spark, root, stage, iceberg_table)
    if lineage is None:
        return spark.read.parquet(_lineage_path(root, stage))  # raises
    return lineage


def reset_stage(root: str, stage: str) -> None:
    shutil.rmtree(os.path.join(root, stage), ignore_errors=True)


def run_stage(
    spark: SparkSession,
    root: str,
    stage: str,
    input_df: DataFrame,
    transform,
    n_buckets: int = 64,
    key: str = "clip_id",
    max_buckets: int | None = None,
    iceberg_table: str | None = None,
) -> DataFrame:
    """Run `transform(bucketed_df) -> DataFrame` checkpointed by bucket.

    Returns the FULL stage output (previously completed buckets read from
    the checkpoint + newly computed ones).  `transform` must be
    deterministic and row-wise (it may not change the `bucket` column).

    ``max_buckets`` processes at most that many pending buckets this
    invocation (operational throttling, and the crash-simulation knob for
    resume tests) — remaining buckets stay pending for the next run, and
    the returned frame contains only data written so far.

    ``iceberg_table`` (e.g. ``"catalog.db.stage1"``) switches the stage
    to a real Iceberg table WHEN the Iceberg Spark runtime is on the
    classpath: data goes through ``writeTo`` with
    ``overwritePartitions`` (atomic bucket replacement under snapshot
    isolation), lineage appends to ``{iceberg_table}_lineage`` and
    records the committed ``snapshot_id``.  Without the runtime jars
    (this sandbox ships none) the name is ignored and the parquet
    protocol below runs — identical layout, identical resume semantics,
    ``snapshot_id`` null.
    """
    data_path = _data_path(root, stage)
    lineage_path = _lineage_path(root, stage)
    run_id = uuid.uuid4().hex[:12]
    use_ice = _use_iceberg(spark, iceberg_table)

    bucketed = input_df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )
    done = completed_buckets(spark, root, stage, iceberg_table)
    pending = sorted(set(range(n_buckets)) - done)
    if max_buckets is not None:
        pending = pending[:max_buckets]

    if pending:
        todo = bucketed.filter(F.col("bucket").isin(pending))
        out = transform(todo)
        if "bucket" not in out.columns:
            raise ValueError("transform must preserve the bucket column")
        snapshot_id = None
        if use_ice:
            snapshot_id = _iceberg_write_data(
                spark, out.repartition("bucket"), iceberg_table
            )
            written = spark.table(iceberg_table).filter(
                F.col("bucket").isin(pending)
            )
        else:
            (
                out.repartition("bucket")
                .write.partitionBy("bucket")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(data_path)
            )
            written = spark.read.parquet(data_path).filter(
                F.col("bucket").isin(pending)
            )
        # lineage AFTER the data commit, with per-bucket row counters
        lineage = written.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n_rows")
        ).withColumns(
            {
                "status": F.lit("complete"),
                "run_id": F.lit(run_id),
                "snapshot_id": F.lit(snapshot_id).cast("string"),
            }
        )
        # empty pending buckets still need lineage rows (0-row complete)
        seen = {r["bucket"] for r in lineage.select("bucket").collect()}
        missing = [b for b in pending if b not in seen]
        if missing:
            empty = spark.createDataFrame(
                [(b, 0, "complete", run_id, snapshot_id) for b in missing],
                "bucket int, n_rows bigint, status string, run_id string, "
                "snapshot_id string",
            )
            lineage = lineage.unionByName(empty)
        if use_ice:
            ltable = f"{iceberg_table}_lineage"
            if spark.catalog.tableExists(ltable):
                lineage.writeTo(ltable).append()
            else:
                lineage.writeTo(ltable).using("iceberg").create()
        else:
            lineage.coalesce(1).write.mode("append").parquet(lineage_path)

    if use_ice:
        return spark.table(iceberg_table)
    return spark.read.parquet(data_path)
