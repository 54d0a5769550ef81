"""Metadata-integrity audit + VAD speech-activity gate tests."""

import numpy as np
import pytest

from top_secret_spark.sources.clips import (
    CLIPS_SCHEMA_DDL,
    integrity_rows_for_range,
    vad_rows_for_range,
)


def _spark_clips(spark, pdf):
    return spark.createDataFrame(pdf, schema=CLIPS_SCHEMA_DDL)


EXPECTED_VIOLATION = {
    0: None,
    1: None,
    2: "duration_mismatch",
    3: "misaligned_payload",
    4: "unknown_codec",
    5: "bad_sample_rate",
    6: "empty_payload",
    7: None,
}
EXPECTED_IMPLIED = {
    0: 1000.0, 1: 800.0, 2: 500.0, 3: None,
    4: None, 5: None, 6: 0.0, 7: 500.0,
}


def test_metadata_audit_planted_classes(spark):
    from top_secret_spark.operators.integrity import with_metadata_audit

    out = (
        with_metadata_audit(_spark_clips(spark, integrity_rows_for_range(0, 32)))
        .select("clip_id", "meta_violation", "implied_dur_ms")
        .collect()
    )
    assert len(out) == 32
    for row in out:
        r = int(row["clip_id"].split("-")[1])
        kind = r % 8
        assert row["meta_violation"] == EXPECTED_VIOLATION[kind], (r, kind)
        assert row["implied_dur_ms"] == EXPECTED_IMPLIED[kind], (r, kind)


def test_metadata_audit_null_metadata_named(spark):
    from top_secret_spark.operators.integrity import with_metadata_audit

    df = spark.createDataFrame(
        [
            ("a", bytes(16000), None, 1000, "pcm16", "t"),
            ("b", bytes(16000), 8000, None, "pcm16", "t"),
            ("c", bytes(16000), 8000, 1000, None, "t"),
        ],
        schema=CLIPS_SCHEMA_DDL,
    )
    rows = {
        r["clip_id"]: r
        for r in with_metadata_audit(df)
        .select("clip_id", "meta_violation", "implied_dur_ms")
        .collect()
    }
    # NULL codec is MISSING metadata (the documented taxonomy), not an
    # unrecognized tag — unknown_codec is reserved for present-but-
    # unsupported codec strings
    assert rows["a"]["meta_violation"] == "missing_metadata"
    assert rows["b"]["meta_violation"] == "missing_metadata"
    assert rows["c"]["meta_violation"] == "missing_metadata"
    assert rows["a"]["implied_dur_ms"] is None  # sr unknown
    assert rows["b"]["implied_dur_ms"] == 1000.0  # computable, dur missing


def test_metadata_audit_is_pure_catalyst(spark):
    from top_secret_spark.operators.integrity import with_metadata_audit

    df = _spark_clips(spark, integrity_rows_for_range(0, 8))
    plan = with_metadata_audit(df)._jdf.queryExecution().executedPlan().toString()
    # the audit itself adds no Python evaluation and no Exchange on top
    # of the generator's own mapInPandas source
    assert plan.count("ArrowEvalPython") == 0
    assert "Exchange" not in plan


VAD_EXPECTED = {
    # kind: (vad_ok, speech_ratio, n_segments, drop_reason)
    0: (True, 1.0, 1, None),
    1: (True, 0.75, 2, None),
    2: (True, 0.125, 1, "low_speech_ratio"),
    3: (True, 0.0, 0, "no_speech"),
    4: (False, 0.0, 0, "vad_error"),
}


def test_speech_activity_planted_classes(spark):
    from top_secret_spark.operators.audio import (
        speech_drop_reason_col,
        with_speech_activity,
    )

    # 30 rows = 6 full (class x codec) periods of 5, codecs cycle r % 3
    out = (
        with_speech_activity(_spark_clips(spark, vad_rows_for_range(0, 30)))
        .withColumn("reason", speech_drop_reason_col(min_ratio=0.3))
        .select("clip_id", "vad_ok", "speech_ratio", "n_speech_segments", "reason")
        .collect()
    )
    assert len(out) == 30
    for row in out:
        r = int(row["clip_id"].split("-")[1])
        ok, ratio, nseg, reason = VAD_EXPECTED[r % 5]
        assert row["vad_ok"] == ok, r
        # planted ratios are dyadic and every sample is unambiguous, so
        # the measurement is exact, not approximate
        assert row["speech_ratio"] == ratio, r
        assert row["n_speech_segments"] == nseg, r
        assert row["reason"] == reason, r


def test_speech_activity_empty_payload_not_ok(spark):
    from top_secret_spark.operators.audio import with_speech_activity

    df = spark.createDataFrame(
        [("e", b"", 8000, 0, "pcm16", "t")], schema=CLIPS_SCHEMA_DDL
    )
    row = with_speech_activity(df).collect()[0]
    assert row["vad_ok"] is False
    assert row["speech_ratio"] == 0.0


def test_speech_activity_gap_parameter(spark):
    """A pause shorter than gap_ms keeps one segment; the planted
    class-1 pause (2000 samples = 250 ms @ 8 kHz) splits at the default
    200 ms gap but NOT at 300 ms."""
    from top_secret_spark.operators.audio import with_speech_activity

    pdf = vad_rows_for_range(1, 2)  # class 1: 3000 | 2000 pause | 3000
    merged = with_speech_activity(
        _spark_clips(spark, pdf), gap_ms=300
    ).collect()[0]
    assert merged["n_speech_segments"] == 1
    # the trimmed single segment spans the pause too: 8000 / 8000
    assert merged["speech_ratio"] == 1.0
