"""Structured Streaming lift of the fused pipeline: a file-source stream
must produce exactly the batch pipeline's output."""

import os

import pytest
from pyspark.sql import functions as F

from top_secret_spark.pipeline import run_pipeline
from top_secret_spark.sources.clips import clips_df, write_clips_parquet
from top_secret_spark.streaming import keep_drop_counters, scrub_stream


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    write_clips_parquet(src, 120, with_audio=False)

    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")
    stream = spark.readStream.schema(schema).parquet(src)
    out = scrub_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("scrubbed_stream")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["clip_id"]: (r["keep"], r["drop_reason"], r["scrubbed"])
        for r in spark.sql("select * from scrubbed_stream").collect()
    }
    exp = {
        r["clip_id"]: (r["keep"], r["drop_reason"], r["scrubbed"])
        for r in run_pipeline(clips_df(spark, 120, with_audio=False)).collect()
    }
    assert got == exp


def test_scrub_stream_rejects_batch_frame(spark):
    df = clips_df(spark, 5, with_audio=False)
    with pytest.raises(ValueError, match="streaming"):
        scrub_stream(df)


def test_keep_drop_counters_plan(spark, tmp_path):
    src = str(tmp_path / "in2")
    write_clips_parquet(src, 40, with_audio=False)
    schema = ("clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")
    stream = spark.readStream.schema(schema).parquet(src)
    counters = keep_drop_counters(
        scrub_stream(stream).withColumn("ts", F.current_timestamp())
    )
    q = (
        counters.writeStream.format("memory")
        .queryName("kd_counters")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only closed windows; with current_timestamp the
    # window is still open, so we assert the stream RAN and the schema is
    # right rather than row contents
    df = spark.sql("select * from kd_counters")
    assert df.columns == ["window_start", "window_end", "drop_reason", "n"]
