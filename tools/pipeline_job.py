"""Standalone pipeline throughput job — the spark-submit target for the
N vs 4N scaling-efficiency evidence (BASELINE.json north_rule).

Usage:
  spark-submit --master local[N] --py-files top_secret_spark.zip \
      tools/pipeline_job.py --n-clips 100000

Prints one JSON line: {"n_clips":..., "elapsed_sec":..., "clips_per_sec":...}

The timed section excludes Spark session startup (cluster-size-independent
constant) and excludes input generation (it is forced to a cached/counted
DataFrame first), so the measurement isolates pipeline throughput.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-clips", type=int, default=100_000)
    ap.add_argument("--with-audio", action="store_true")
    ap.add_argument("--input", default=None,
                    help="pre-generated clips parquet dir (overrides generation)")
    # 60k-row Arrow batches measured ~1.3x the 20k default at local[32]:
    # the kernels chunk internally (langid._CHUNK_BYTES) so batch size no
    # longer drives their working set, and fewer crossings = less fixed
    # per-batch cost (serialization setup, pandas assembly)
    ap.add_argument("--arrow-batch", type=int, default=60_000)
    ap.add_argument("--partitions-per-core", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("tss-pipeline-bench")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(args.arrow_batch))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from top_secret_spark.pipeline import run_pipeline
    from top_secret_spark.sources.clips import clips_df
    from top_secret_spark.util import ship_package

    ship_package(spark)
    cores = spark.sparkContext.defaultParallelism

    if args.input:
        clips = spark.read.parquet(args.input)
        n = clips.count()
    else:
        # materialize the input first so generation cost stays out of the
        # timed section; 4 partitions per core for stragglerless scaling
        clips = clips_df(
            spark, args.n_clips, with_audio=args.with_audio,
            partitions=cores * args.partitions_per_core,
        ).cache()
        n = clips.count()

    # warmup: spawn the Python workers and build the model singletons on
    # every core before timing — steady-state throughput is the metric
    # (a real 10^12-row run amortizes startup to nothing)
    warm = clips_df(spark, cores * 64, with_audio=False, partitions=cores)
    run_pipeline(warm).filter(F.col("keep")).count()

    t0 = time.time()
    out = run_pipeline(clips)
    kept = out.filter(F.col("keep")).count()
    elapsed = time.time() - t0

    print(json.dumps({
        "n_clips": n,
        "kept": kept,
        "cores": cores,
        "elapsed_sec": round(elapsed, 3),
        "clips_per_sec": round(n / elapsed, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
