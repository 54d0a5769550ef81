"""Similarity search over embedding columns (array<float>).

Two paths:
  * brute-force cosine top-k — the exact baseline: query vectors are
    broadcast (numpy matrix inside the UDF closure), each Arrow batch is
    one matmul, global top-k = per-partition top-k then a tiny final
    sort.  Scales linearly in corpus size with zero shuffle of vectors
    (only (query_id, vec_id, score) triples move).
  * LSH-bucketed ANN — random-hyperplane signatures (Charikar 2002):
    sign-bit sketches bucket the corpus; queries probe only their bucket
    (plus multi-probe neighbors), turning top-k into a bucket-local
    matmul.  The scale path when the corpus itself is 10^11 vectors.

Both are deterministic: hyperplanes derive from a fixed seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

SCORES_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )
)


def _normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def make_cosine_scores_udf(queries: list[tuple[int, list[float]]]):
    """UDF: embedding → [(query_id, cosine)] for every query — one
    numpy matmul per Arrow batch against the broadcast query matrix."""
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    qmat = _normalize_rows(np.array([q[1] for q in queries], dtype=np.float64))

    @pandas_udf(SCORES_TYPE)
    def scores(embs: pd.Series) -> pd.Series:
        mat = np.array(embs.tolist(), dtype=np.float64)
        if mat.ndim != 2 or len(mat) == 0:
            return pd.Series([[]] * len(embs))
        sims = _normalize_rows(mat) @ qmat.T  # (batch, n_queries)
        out = [
            [
                {"query_id": int(qids[j]), "score": float(sims[i, j])}
                for j in range(len(qids))
            ]
            for i in range(len(mat))
        ]
        return pd.Series(out)

    return scores


def brute_force_top_k(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query → (query_id, vec_id, score, rank).

    Plan shape: scan → UDF project → explode → window top-k.  The window
    partitions by query_id (small count), and AQE coalesces the tiny
    exchange of scalar triples — no vectors are ever shuffled."""
    scored = df.select(
        F.col(id_col),
        F.explode(make_cosine_scores_udf(queries)(F.col(emb_col))).alias("s"),
    ).select(
        F.col("s.query_id").alias("query_id"),
        F.col(id_col),
        F.col("s.score").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("score", F.round("score", 6))
    )


# --- LSH-bucketed ANN -----------------------------------------------------------


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def make_lsh_bucket_udf(dim: int, n_bits: int = 16, seed: int = 42):
    """Random-hyperplane signature: embedding → int bucket (n_bits sign
    bits packed)."""
    planes = _hyperplanes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    @pandas_udf(T.LongType())
    def bucket(embs: pd.Series) -> pd.Series:
        mat = np.array(embs.tolist(), dtype=np.float64)
        if mat.ndim != 2 or len(mat) == 0:
            return pd.Series([0] * len(embs))
        bits = (mat @ planes.T) > 0
        return pd.Series((bits @ weights).astype(np.int64))

    return bucket


def with_lsh_bucket(
    df: DataFrame, dim: int, emb_col: str = "embedding", n_bits: int = 16
) -> DataFrame:
    return df.withColumn("lsh_bucket", make_lsh_bucket_udf(dim, n_bits)(F.col(emb_col)))


def ann_top_k(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    dim: int,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: probe only corpus rows whose LSH bucket is
    within `multiprobe` bit flips of the query's bucket, then exact
    cosine within the probed set.

    The bucket filter is a broadcast IN-list (queries are few), so the
    plan is scan → filter (pushable) → UDF → window — the corpus fraction
    scored shrinks ~2^-n_bits per probe set."""
    planes = _hyperplanes(dim, n_bits)
    weights = 1 << np.arange(n_bits, dtype=np.int64)

    probe_buckets: set[int] = set()
    for _, vec in queries:
        bits = (np.array(vec, dtype=np.float64) @ planes.T) > 0
        base = int(bits @ weights)
        probe_buckets.add(base)
        if multiprobe >= 1:
            for i in range(n_bits):
                probe_buckets.add(base ^ (1 << i))
        if multiprobe >= 2:
            for i in range(n_bits):
                for j in range(i + 1, n_bits):
                    probe_buckets.add(base ^ (1 << i) ^ (1 << j))

    bucketed = with_lsh_bucket(df, dim, emb_col, n_bits)
    probed = bucketed.filter(F.col("lsh_bucket").isin(*[int(b) for b in probe_buckets]))
    return brute_force_top_k(probed, queries, k, id_col, emb_col)
