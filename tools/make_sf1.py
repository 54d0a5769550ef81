"""Generate an sf1 THROUGHPUT bench point by deterministic 10x
replication of the driver's sf0.1 tables (testdata stops at sf0.1; the
driver's generator is not available to us and /root/testdata is
read-only, so a from-scratch regeneration at sf1 is impossible —
replication with id remapping is the honest local substitute).

Only the three tables the headline bench reads are produced:

* ``lineitem``  — 10 copies, ``l_orderkey`` offset per replica.  The
  tpch_q1 aggregation groups by (returnflag, linestatus), so replication
  scales the scanned rows without changing the group structure: a pure
  throughput point.
* ``embeddings`` — 10 copies, ``id`` offset.  Brute-force cosine top-k
  cost is linear in corpus rows; duplicate vectors only introduce ties,
  which the rank tiebreak already handles.
* ``documents`` — 10 copies, ``doc_id`` offset, and replica k>0 is
  passed through a per-replica LETTER-SUBSTITUTION cipher (Caesar
  rotation by k, case-preserving) — bijective on CHARACTERS, so all
  within-replica structure (exact dups, char-shingle Jaccard, lengths,
  whitespace, word boundaries) is preserved EXACTLY while
  cross-replica character n-grams decorrelate.  The minhash arm then
  sees 10x the rows with the identical per-replica dup/similarity
  distribution.  (Two rejected designs, kept for the record: rewriting
  whitespace runs to a shared `` rk<k> `` token collapsed
  whitespace-variant near-dups into exact dups and put the replica
  token into every shingle — candidates exploded 250x; prefixing each
  word ``rk<k>`` was bijective on WORDS but the shingles are character
  n-grams, which mostly survive a short shared prefix — candidates
  still exploded 210x.  Both measured the input artifact, not the
  operator.)

This is a THROUGHPUT scale point, not a correctness scale: oracles stay
at sf0.01.  Output dir name must end in ``sf1`` so bench.py parses
SF=1.  Usage:

    python tools/make_sf1.py [/tmp/tss_sf1]
    SPARK_GRAFT_SF_DIR=/tmp/tss_sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tss_sf1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("tss-make-sf1")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    key_off = 10_000_000_000

    li_parts = [
        li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(k * key_off)
        )
        for k in range(REPLICAS)
    ]
    li_out = li_parts[0]
    for p in li_parts[1:]:
        li_out = li_out.unionByName(p)
    li_out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )

    emb_parts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * key_off))
        for k in range(REPLICAS)
    ]
    emb_out = emb_parts[0]
    for p in emb_parts[1:]:
        emb_out = emb_out.unionByName(p)
    emb_out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )

    doc_parts = []
    for k in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * key_off))
        if k:
            lo = "abcdefghijklmnopqrstuvwxyz"
            up = lo.upper()
            rot = lo[k:] + lo[:k]
            d = d.withColumn(
                "text", F.translate("text", lo + up, rot + rot.upper())
            )
        doc_parts.append(d)
    docs_out = doc_parts[0]
    for p in doc_parts[1:]:
        docs_out = docs_out.unionByName(p)
    docs_out.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    for name in ("lineitem", "embeddings", "documents"):
        n = spark.read.parquet(f"{out_dir}/{name}.parquet").count()
        print(f"{name}: {n:,} rows")
    spark.stop()


if __name__ == "__main__":
    main()
