"""Checkpointed end-to-end pipeline job with resume — the north-rule
operational workflow as a spark-submit target:

    spark-submit --master local[N] --py-files top_secret_spark.zip \
        tools/checkpointed_pipeline_job.py --root /tmp/tss_ckpt \
        --n-clips 100000 [--kill-after-buckets K]

Runs the fused quality-filter + scrub pipeline THROUGH the bucket-
granular checkpoint layer (sources/checkpoint.py): buckets by
xxhash64(clip_id), skips buckets whose lineage rows are complete, writes
data + lineage per bucket.  Re-invoking the same command after a crash
(simulate one with --kill-after-buckets) resumes from the checkpoint and
produces byte-identical output — print the lineage summary and a content
hash so two runs can be compared.

Prints one JSON line: {"n_rows":..., "kept":..., "completed_buckets":...,
"pending_before":..., "content_hash":..., "elapsed_sec":...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Pinned public Iceberg Spark runtime (Maven Central coordinates) for
#: the --iceberg lane.  Newest published line as of pinning: Spark 4.0 /
#: Scala 2.13, Iceberg 1.10.0.
ICEBERG_COORDS = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="checkpoint root directory")
    ap.add_argument("--n-clips", type=int, default=100_000)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument(
        "--kill-after-buckets", type=int, default=None,
        help="process only this many pending buckets then exit (crash "
        "simulation for the resume test)",
    )
    ap.add_argument("--reset", action="store_true", help="clear the stage first")
    ap.add_argument(
        "--iceberg", action="store_true",
        help="attempt the Iceberg lane: configure the catalog and "
        "checkpoint through an Iceberg table with native snapshot "
        "lineage instead of the parquet fallback.  Under spark-submit, "
        "ALSO pass `--packages " + ICEBERG_COORDS + "` on the submit "
        "command line (builder-time spark.jars.packages lands after "
        "the JVM launches and is ignored there; the builder config "
        "covers in-process SparkSession creation, e.g. pytest).  "
        "Attempted 2026-08-21 in this sandbox: ivy resolution reached "
        "out and failed with 'Host repo1.maven.org not found' — no "
        "network egress; the lane activates the moment the jar is "
        "resolvable or pre-dropped on the classpath.",
    )
    ap.add_argument("--iceberg-table", default="local.tss.pipeline_out")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = (
        SparkSession.builder.appName("tss-checkpointed-pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if args.iceberg:
        # Pinned PUBLIC Iceberg runtime (Maven Central).  PySpark here
        # is 4.1.x; this is the newest published runtime line (Spark
        # 4.0, Scala 2.13) — swap in the 4.1 artifact the moment it
        # publishes.  Offline sandbox: resolution fails, the job keeps
        # the parquet fallback, and the output JSON records
        # iceberg="unresolved" so the attempt is auditable.
        builder = (
            builder.config(
                "spark.sql.catalog.local",
                "org.apache.iceberg.spark.SparkCatalog",
            )
            .config("spark.sql.catalog.local.type", "hadoop")
            .config(
                "spark.sql.catalog.local.warehouse",
                os.path.join(args.root, "iceberg_warehouse"),
            )
        )
    if args.iceberg:
        # When the JVM is not up yet (direct `python` invocation), a
        # failing spark.jars.packages resolution kills gateway launch
        # outright — retry WITHOUT the packages conf so the documented
        # parquet fallback (and the auditable "unresolved" record) is
        # actually reachable.  Under spark-submit the JVM pre-exists,
        # this conf is inert, and jars come from --packages instead.
        try:
            spark = builder.config(
                "spark.jars.packages", ICEBERG_COORDS
            ).getOrCreate()
        except Exception as e:
            print(f"iceberg runtime unresolvable ({type(e).__name__}); "
                  "continuing on the parquet fallback", file=sys.stderr)
            builder = builder.config("spark.jars.packages", "")
            spark = builder.getOrCreate()
    else:
        spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from top_secret_spark.pipeline import run_pipeline
    from top_secret_spark.sources.checkpoint import (
        completed_buckets,
        iceberg_available,
        reset_stage,
        run_stage,
        stage_lineage,
    )
    from top_secret_spark.sources.clips import clips_df
    from top_secret_spark.util import ship_package

    ship_package(spark)
    stage = "pipeline"
    if args.reset:
        reset_stage(args.root, stage)

    clips = clips_df(spark, args.n_clips, with_audio=False)
    done_before = completed_buckets(spark, args.root, stage)
    pending_before = args.n_buckets - len(done_before)

    def transform(df):
        return run_pipeline(df).select(
            "clip_id", "bucket", "keep", "drop_reason", "scrubbed"
        )

    iceberg_on = args.iceberg and iceberg_available(spark)
    t0 = time.time()
    out = run_stage(
        spark, args.root, stage, clips, transform, args.n_buckets,
        # crash simulation: commit only K buckets this run, exactly like
        # a mid-job failure after K bucket commits; the next invocation
        # resumes from the lineage.
        max_buckets=args.kill_after_buckets,
        iceberg_table=args.iceberg_table if iceberg_on else None,
    )
    n = out.count()
    kept = out.filter(F.col("keep")).count()
    elapsed = time.time() - t0

    # order-insensitive content hash over the full checkpointed output
    content_hash = (
        out.select(F.xxhash64("clip_id", "keep", "scrubbed").alias("h"))
        .agg(F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias("s"))
        .collect()[0]["s"]
    )
    lin = stage_lineage(spark, args.root, stage)
    completed = lin.filter(F.col("status") == "complete").select(
        "bucket"
    ).distinct().count()

    print(json.dumps({
        "n_rows": n,
        "kept": kept,
        "completed_buckets": completed,
        "pending_before": pending_before,
        "content_hash": content_hash,
        "elapsed_sec": round(elapsed, 3),
        "iceberg": (
            "active" if iceberg_on
            else "unresolved" if args.iceberg
            else "off"
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
