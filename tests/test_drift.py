"""PSI drift monitor (operators/drift.py, q103)."""

import math

import pytest


def test_bucketize_edges_and_bounds(spark):
    from pyspark.sql import functions as F

    from top_secret_spark.operators.drift import bucketize

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (99.9,), (100.0,), (399.0,), (2000.0,)], "v double"
    )
    out = [r.b for r in df.select(
        bucketize(F.col("v"), [0, 100, 200, 400, 800]).alias("b")).collect()]
    assert out == [0, 0, 0, 1, 2, 3]


def test_bucketize_rejects_bad_edges(spark):
    from pyspark.sql import functions as F

    from top_secret_spark.operators.drift import bucketize

    with pytest.raises(ValueError, match="ascending"):
        bucketize(F.col("v"), [100, 0])
    with pytest.raises(ValueError, match="ascending"):
        bucketize(F.col("v"), [1])


def test_psi_identical_snapshots_near_zero(spark):
    from pyspark.sql import functions as F

    from top_secret_spark.operators.drift import psi_drift

    df = spark.range(0, 1000).select((F.col("id") % 7 * 100.0).alias("v"))
    out = psi_drift(df, df, "v", [0, 100, 300, 700]).collect()
    # 3 value buckets plus the always-present NULL bucket (-1) — the
    # spine keeps it even when both snapshots have zero NULLs so a
    # missing-field regression reads as its own bucket moving
    assert len(out) == 4
    assert {r.bucket for r in out} == {-1, 0, 1, 2}
    null_row = next(r for r in out if r.bucket == -1)
    assert null_row.n_before == 0 and null_row.n_after == 0
    assert all(r.psi_total == 0.0 for r in out)


def test_psi_matches_hand_computation(spark):
    from pyspark.sql import functions as F

    from top_secret_spark.operators.drift import psi_drift

    before = spark.range(0, 100).select(
        F.when(F.col("id") < 50, 10.0).otherwise(150.0).alias("v"))
    after = spark.range(0, 100).select(
        F.when(F.col("id") < 20, 10.0).otherwise(150.0).alias("v"))
    out = {r.bucket: r for r in psi_drift(
        before, after, "v", [0, 100, 200]).collect()}
    # Laplace denominator counts the NULL bucket too: 2 value buckets
    # + NULL = 3 buckets, so sum + 3 * 0.5.  The NULL bucket's own
    # term is p == q -> contributes exactly 0 here.
    p0, q0 = 50.5 / 101.5, 20.5 / 101.5
    p1, q1 = 50.5 / 101.5, 80.5 / 101.5
    expect = (p0 - q0) * math.log(p0 / q0) + (p1 - q1) * math.log(p1 / q1)
    assert out[0].n_before == 50 and out[0].n_after == 20
    assert abs(out[0].psi_total - round(expect, 6)) < 1e-9
