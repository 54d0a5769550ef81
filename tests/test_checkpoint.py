"""Checkpoint/lineage layer tests: bucket-granular resume, no recompute of
completed buckets, identical output after resume ([north-rule])."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from top_secret_spark.sources.checkpoint import (
    completed_buckets,
    iceberg_available,
    reset_stage,
    run_stage,
    stage_lineage,
)
from top_secret_spark.sources.clips import clips_df

N_BUCKETS = 8


def transform(df):
    from top_secret_spark.operators.quality import with_quality_signals

    return with_quality_signals(df, "transcript").select(
        "clip_id", "bucket", "n_chars", "n_words"
    )


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "ckpt")


def test_stage_runs_and_records_lineage(spark, root):
    clips = clips_df(spark, 200, with_audio=False)
    out = run_stage(spark, root, "signals", clips, transform, N_BUCKETS)
    assert out.count() == 200
    lin = stage_lineage(spark, root, "signals")
    rows = lin.collect()
    assert {r["bucket"] for r in rows} == set(range(N_BUCKETS))
    assert all(r["status"] == "complete" for r in rows)
    assert sum(r["n_rows"] for r in rows) == 200
    assert completed_buckets(spark, root, "signals") == set(range(N_BUCKETS))


def test_rerun_skips_completed_buckets(spark, root):
    clips = clips_df(spark, 200, with_audio=False)
    run_stage(spark, root, "signals", clips, transform, N_BUCKETS)
    lineage_files_before = sorted(glob.glob(f"{root}/signals/lineage/*.parquet"))

    calls = {"n": 0}

    def counting_transform(df):
        calls["n"] += 1
        return transform(df)

    out = run_stage(spark, root, "signals", clips, counting_transform, N_BUCKETS)
    assert out.count() == 200
    # transform never invoked — nothing pending
    assert calls["n"] == 0
    assert sorted(glob.glob(f"{root}/signals/lineage/*.parquet")) == lineage_files_before


def test_resume_recomputes_only_missing_buckets(spark, root):
    clips = clips_df(spark, 300, with_audio=False)
    full = run_stage(spark, root, "signals", clips, transform, N_BUCKETS)
    expected = {r["clip_id"]: (r["n_chars"], r["n_words"], r["bucket"])
                for r in full.collect()}

    # simulate a crash that lost two buckets: remove their data dirs and
    # rewrite lineage without them
    lost = {1, 5}
    for b in lost:
        shutil.rmtree(f"{root}/signals/data/bucket={b}", ignore_errors=True)
    lin = stage_lineage(spark, root, "signals").filter(
        ~F.col("bucket").isin(list(lost))
    )
    kept = [(r["bucket"], r["n_rows"], r["status"], r["run_id"]) for r in lin.collect()]
    shutil.rmtree(f"{root}/signals/lineage")
    spark.createDataFrame(
        kept, "bucket int, n_rows bigint, status string, run_id string"
    ).write.parquet(f"{root}/signals/lineage")

    processed = []

    def tracking_transform(df):
        processed.extend(
            r["bucket"] for r in df.select("bucket").distinct().collect()
        )
        return transform(df)

    resumed = run_stage(spark, root, "signals", clips, tracking_transform, N_BUCKETS)
    assert sorted(set(processed)) == sorted(lost)  # ONLY lost buckets ran
    got = {r["clip_id"]: (r["n_chars"], r["n_words"], r["bucket"])
           for r in resumed.collect()}
    assert got == expected  # identical output after resume
    assert completed_buckets(spark, root, "signals") == set(range(N_BUCKETS))


def test_partial_bucket_overwritten_not_duplicated(spark, root):
    """Crash AFTER data write but BEFORE lineage write: the bucket's data
    exists but lineage says incomplete → rerun must overwrite, not append."""
    clips = clips_df(spark, 200, with_audio=False)
    run_stage(spark, root, "signals", clips, transform, N_BUCKETS)
    total = spark.read.parquet(f"{root}/signals/data").count()

    lost = 3
    lin = stage_lineage(spark, root, "signals").filter(F.col("bucket") != lost)
    kept = [(r["bucket"], r["n_rows"], r["status"], r["run_id"]) for r in lin.collect()]
    shutil.rmtree(f"{root}/signals/lineage")
    spark.createDataFrame(
        kept, "bucket int, n_rows bigint, status string, run_id string"
    ).write.parquet(f"{root}/signals/lineage")
    # data for bucket 3 still on disk (the "partial write")

    out = run_stage(spark, root, "signals", clips, transform, N_BUCKETS)
    assert out.count() == total  # no duplicates
    assert out.filter(F.col("bucket") == lost).count() == \
        out.select("clip_id").distinct().join(
            clips_df(spark, 200, with_audio=False).select("clip_id"), "clip_id"
        ).count() - out.filter(F.col("bucket") != lost).count()


def test_transform_must_preserve_bucket(spark, root):
    clips = clips_df(spark, 20, with_audio=False)
    with pytest.raises(ValueError, match="bucket"):
        run_stage(spark, root, "bad", clips,
                  lambda df: df.select("clip_id"), N_BUCKETS)


def test_iceberg_detection_runs(spark):
    # sandbox has no Iceberg jars; the probe must return False, not raise
    assert iceberg_available(spark) is False


def test_reset_stage(spark, root):
    clips = clips_df(spark, 50, with_audio=False)
    run_stage(spark, root, "signals", clips, transform, N_BUCKETS)
    reset_stage(root, "signals")
    assert not os.path.exists(f"{root}/signals")


def test_max_buckets_throttle_and_resume(spark, root):
    """max_buckets commits only K buckets (crash simulation); the next
    run resumes and total output equals an uninterrupted run."""
    clips = clips_df(spark, 200, with_audio=False)
    partial = run_stage(spark, root, "signals", clips, transform, N_BUCKETS,
                        max_buckets=3)
    assert completed_buckets(spark, root, "signals") == set(range(3)) or \
        len(completed_buckets(spark, root, "signals")) == 3
    assert partial.count() < 200
    full = run_stage(spark, root, "signals", clips, transform, N_BUCKETS)
    assert full.count() == 200
    assert completed_buckets(spark, root, "signals") == set(range(N_BUCKETS))


def test_iceberg_name_ignored_without_runtime(spark, root):
    """Without the Iceberg runtime jars (this sandbox), passing an
    iceberg_table must transparently fall back to the parquet protocol
    — identical layout, identical resume, snapshot_id null."""
    from top_secret_spark.sources.checkpoint import iceberg_available, stage_lineage

    assert not iceberg_available(spark)
    clips = clips_df(spark, 80, with_audio=False)
    out = run_stage(spark, root, "ice_fb", clips, transform, N_BUCKETS,
                    iceberg_table="local.db.ice_fb")
    assert out.count() == 80
    assert os.path.exists(f"{root}/ice_fb/data")
    lin = stage_lineage(spark, root, "ice_fb", iceberg_table="local.db.ice_fb")
    rows = lin.collect()
    assert {r["status"] for r in rows} == {"complete"}
    assert all(r["snapshot_id"] is None for r in rows)
    # resume still works through the fallback
    again = run_stage(spark, root, "ice_fb", clips, transform, N_BUCKETS,
                      iceberg_table="local.db.ice_fb")
    assert again.count() == 80


@pytest.mark.skipif(
    "not __import__('top_secret_spark.sources.checkpoint', fromlist=['x'])"
    ".iceberg_available(__import__('pyspark.sql', fromlist=['SparkSession'])"
    ".SparkSession.getActiveSession() or __import__('pyspark.sql', "
    "fromlist=['SparkSession']).SparkSession.builder.getOrCreate())",
    reason="Iceberg Spark runtime not on the classpath",
)
def test_iceberg_branch_writes_snapshots(spark, root):
    """With the runtime present: data through writeTo/overwritePartitions,
    lineage rows carry the committed snapshot_id."""
    from top_secret_spark.sources.checkpoint import stage_lineage

    table = "local.db.ice_real"
    clips = clips_df(spark, 80, with_audio=False)
    out = run_stage(spark, root, "ice_real", clips, transform, N_BUCKETS,
                    iceberg_table=table)
    assert out.count() == 80
    lin = stage_lineage(spark, root, "ice_real", iceberg_table=table)
    assert all(r["snapshot_id"] is not None for r in lin.collect())
