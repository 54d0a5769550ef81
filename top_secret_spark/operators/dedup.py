"""Deduplication operators for training-data pipelines.

Four families, each chosen for a different scale/accuracy point:

  * exact           — normalized-text 64-bit fingerprint, one hash groupBy;
                      the only full-shuffle, and it shuffles 8-byte keys,
                      not documents.
  * MinHash + LSH   — char-shingle MinHash signatures (numpy per Arrow
                      batch), banded LSH bucketing; candidate generation
                      is an explode + groupBy on small (band, hash) keys,
                      so the shuffle is signatures, never text.
  * SimHash         — 64-bit sign-of-weighted-sum sketch; near-dup =
                      Hamming proximity via band buckets.
  * n-gram Jaccard  — exact verification on candidate pairs only (join
                      text back for candidates — tiny relative volume).

At 100 TB the invariant everywhere: never shuffle document bodies to find
duplicates — shuffle fixed-width sketches, then fetch text only for the
candidate set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .text_analysis import fingerprint_col

# --- exact dedup ---------------------------------------------------------------


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", fingerprint_col(text_col))


def exact_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fingerprint groups with >1 member → (fingerprint, n_docs, doc_ids)."""
    return (
        with_fingerprint(df, text_col)
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the min-id representative per fingerprint (deterministic)."""
    fp = with_fingerprint(df, text_col)
    w_min = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    return fp.join(w_min, ["fingerprint", id_col], "inner").drop("fingerprint")


def dedup_exact_keep_best(
    df: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Survivorship POLICY dedup: one row per normalized-content
    fingerprint, keeping the HIGHEST-``quality_col`` member (ties break
    to the lowest id, so the survivor is deterministic under any
    partitioning).  ``dedup_exact`` keeps min-id — fine when members
    are byte-identical; once the fingerprint normalizes (case, Unicode
    whitespace), members genuinely differ and WHICH one survives
    matters.  CCNet keeps the best-perplexity copy of each duplicate
    for exactly this reason; raw-length / quality-score policies are
    the same shape — callers pass any numeric column.

    Scale: identical plan to ``dedup_exact`` — the groupBy shuffles
    only (fingerprint, quality, id), three fixed-width columns, and
    ``min_by`` folds map-side, so winner selection never moves document
    bodies; the winners join is on the 8-byte (fingerprint, id) pair.
    NULL quality loses to any non-NULL quality (coalesced to -inf, so
    its negation sorts LAST under min).

    The ordering key is ``(-quality, id)`` under ``min_by`` — quality
    is numeric so negation is safe, while the id column may be a
    STRING: negating it (the max_by-with-negated-id formulation) would
    cast to double → NULL for every 'doc-0001'-style id and hand the
    tie to partition order, the exact nondeterminism this operator
    exists to prevent."""
    fp = with_fingerprint(df, text_col)
    winners = fp.groupBy("fingerprint").agg(
        F.min_by(
            F.col(id_col),
            F.struct(
                -F.coalesce(
                    F.col(quality_col).cast("double"),
                    F.lit(float("-inf")),
                ),
                F.col(id_col),
            ),
        ).alias(id_col)
    )
    return fp.join(winners, ["fingerprint", id_col], "inner").drop("fingerprint")


def _rebuild_documents(df, rebuilt, id_col, text_col, n_orig, counter_col):
    """Shared rebuild tail of the line/span dedup operators: left-join
    the rebuilt (_rid, _new_text, _n_kept) rows back onto ``df``,
    replace ``text_col`` and append ``counter_col`` = original units -
    kept units.  Rows with NULL id or NULL text pass through UNTOUCHED
    with counter 0: an id-keyed rebuild can neither group nor re-join a
    NULL id (a non-null-safe join would silently wipe the row's text),
    so callers exclude those rows from the dedup computation and this
    tail preserves them verbatim."""
    passthrough = F.col(id_col).isNull() | F.col(text_col).isNull()
    out = df.join(rebuilt, df[id_col] == rebuilt["_rid"], "left")
    return (
        out.withColumn(
            counter_col,
            F.when(passthrough, F.lit(0)).otherwise(
                n_orig - F.coalesce(F.col("_n_kept"), F.lit(0))
            ),
        )
        .withColumn(
            text_col,
            F.when(passthrough, F.col(text_col)).otherwise(
                F.coalesce(F.col("_new_text"), F.lit(""))
            ),
        )
        .drop("_rid", "_new_text", "_n_kept")
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Cross-corpus LINE dedup (the C4-style boilerplate strip): every
    distinct line keeps exactly its globally-first occurrence — ordered
    by (id, position) — and later copies are removed; each document's
    text is rebuilt from its surviving lines.  Crawled corpora and ASR
    transcript dumps are full of repeated boilerplate lines
    ("Subscribe", cookie banners, station idents) that document-level
    dedup can never touch because the surrounding text differs.

    Replaces ``text_col`` in place (a document whose every line was
    seen earlier becomes the empty string — the quality gate's
    ``too_short`` names it downstream; NULL text passes through NULL)
    and appends ``n_lines_removed``.

    Scale shape — two shuffles, no self-join, no window over a skewed
    partition:

      1. ``posexplode`` → ``groupBy(line).min(struct(id, pos))``.
         Partial aggregation combines map-side, so a boilerplate line
         repeated 10^9 times arrives at the reducer once per mapper —
         the skew-safe alternative to ``row_number() OVER (PARTITION BY
         line)``, which would serialize the hot line through one task.
         Grouping on the line itself (not a 64-bit digest) makes the
         operator exact: a hash collision would silently delete every
         copy of one of the colliding lines, including its first.
      2. The winner rows ARE the surviving lines, so reassembly is one
         ``groupBy(id)`` + ordered concat — no verify join back.

    The rebuilt text joins back to ``df`` on the 8-byte id to reattach
    untouched columns.

    ``sep`` sets the dedup unit, taken as a LITERAL separator (escaped
    for the regex split, used verbatim for the rejoin): the default
    "\n" is C4-style LINE dedup; "\n\n" gives MassiveText-style
    PARAGRAPH dedup with the identical scale shape; any literal string
    ("\t", "---") works.
    """
    import re as _re

    if not sep:
        raise ValueError("sep must be a non-empty literal separator")
    sep_re = _re.escape(sep)
    lines = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), sep_re)).alias("_pos", "_line"),
    )
    winners = lines.groupBy("_line").agg(
        F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_w")
    )
    rebuilt = (
        winners.select(
            F.col("_w._id").alias("_rid"),
            F.col("_w._pos").alias("_pos"),
            "_line",
        )
        .groupBy("_rid")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
            ).alias("_new_text"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    n_orig = F.size(F.split(F.col(text_col), sep_re))
    return _rebuild_documents(
        df, rebuilt, id_col, text_col, n_orig, "n_lines_removed"
    )


def dedup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 3,
    delim: str = "\n",
) -> DataFrame:
    """C4's exact span-dedup rule (Raffel et al. 2020: "we discarded
    all but one of any three-sentence span occurring more than once"):
    every ``span``-sentence window keeps only its globally-first
    (id, position) occurrence; the sentences covered by any LOSING
    occurrence are removed and each document rebuilt from its
    survivors.  Complements :func:`dedup_lines` — a copied 3-sentence
    passage inside otherwise-different articles is invisible to both
    line- and document-level dedup.

    ``delim`` is a LITERAL sentence separator (split and rejoin use it
    verbatim); single pass, as in C4 — removal is not iterated.
    Documents with fewer than ``span`` sentences are untouched; NULL
    text passes through.  Appends ``n_sentences_removed``.

    Scale shape: spans come from a pure-Catalyst
    ``transform(sequence)`` over the split array (no per-doc Python);
    the winner per span is a skew-safe ``groupBy(span).min(struct)``
    with map-side combine; losing occurrences are found with a
    LEFT-ANTI join on the COMPOSITE (span, id, pos) key — near-unique,
    so a boilerplate span repeated 10^9 times still spreads across
    tasks instead of serializing one join partition the way a
    text-only key would.  Losers explode to (id, sentence-pos) longs
    and survivors rebuild with one groupBy(id).  Span text shuffles
    once for the aggregation and once for the anti-join — grouping on
    the text itself (not a digest) keeps the operator exact."""
    if span < 2:
        raise ValueError(
            "dedup_spans: span must be >= 2 (span=1 is dedup_lines; "
            "span<=0 would match every document on the empty span)"
        )
    import re as _re

    lit = _re.escape(delim)
    arr = F.split(F.col(text_col), lit)
    spans_col = F.when(
        F.size(arr) >= span,
        F.transform(
            F.sequence(F.lit(0), F.size(arr) - span),
            lambda i: F.struct(
                i.alias("_spos"),
                F.concat_ws(delim, F.slice(arr, i + 1, span)).alias("_stext"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<_spos:int,_stext:string>>"))
    spans = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.explode(spans_col).alias("_s")
    ).select("_id", F.col("_s._spos").alias("_spos"),
             F.col("_s._stext").alias("_stext"))
    winners = spans.groupBy("_stext").agg(
        F.min(F.struct(F.col("_id"), F.col("_spos"))).alias("_w")
    )
    winner_rows = winners.select(
        "_stext",
        F.col("_w._id").alias("_id"),
        F.col("_w._spos").alias("_spos"),
    )
    # anti-join on the composite key: the hot span's occurrences have
    # distinct (id, pos), so the join hash-partitions evenly
    losers = spans.join(
        winner_rows, ["_stext", "_id", "_spos"], "left_anti"
    ).select("_id", "_spos")
    removed = losers.select(
        "_id",
        F.explode(
            F.sequence(F.col("_spos"), F.col("_spos") + F.lit(span - 1))
        ).alias("_pos"),
    ).distinct()
    sents = df.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.posexplode(arr).alias("_pos", "_sent"),
    )
    kept = sents.join(removed, ["_id", "_pos"], "left_anti")
    rebuilt = kept.groupBy(F.col("_id").alias("_rid")).agg(
        F.concat_ws(
            delim,
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_sent"))),
                lambda s: s["_sent"],
            ),
        ).alias("_new_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    n_orig = F.size(F.split(F.col(text_col), lit))
    return _rebuild_documents(
        df, rebuilt, id_col, text_col, n_orig, "n_sentences_removed"
    )


def _word_ngrams(text_col: str, n: int):
    """Array of lowercase word ``n``-grams (space-joined) — empty array
    for texts shorter than ``n`` words or NULL."""
    words = F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def flag_contaminated(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/C4-style eval-leak check):
    flag every document sharing at least one lowercase word ``n``-gram
    with the benchmark/eval set, so training data can be scrubbed of
    test-set content before a model memorizes its own eval.

    Appends ``contaminated`` (bool) and ``n_contaminated_ngrams`` (the
    number of DISTINCT benchmark n-grams the doc contains).

    Scale shape: the benchmark side is small by definition (an eval set,
    not a corpus), so its distinct n-grams BROADCAST; the corpus side
    explodes to (id, xxhash64(ngram)) and probes the broadcast hash
    table map-side — no shuffle of corpus text, no shuffle at all except
    the per-doc match count groupBy on 8-byte ids.  The join key is the
    64-bit hash (fixed width, cache-friendly) but the match is verified
    on the n-gram STRING carried by the broadcast side, so a hash
    collision cannot falsely condemn a document — exactness at zero
    extra shuffle cost.  The final flag joins back to ``df`` on the id;
    docs shorter than ``n`` words are never flagged."""
    bench_grams = (
        benchmark.select(
            F.explode(_word_ngrams(bench_text_col, n)).alias("_gram")
        )
        .distinct()
        .select(F.xxhash64("_gram").alias("_gh"), "_gram")
    )
    doc_grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_word_ngrams(text_col, n)).alias("_dg"),
    ).select("_id", F.xxhash64("_dg").alias("_gh"), "_dg")
    matches = (
        doc_grams.join(F.broadcast(bench_grams), "_gh")
        .filter(F.col("_dg") == F.col("_gram"))
        .groupBy("_id")
        # distinct over the 8-byte hash, not the string: the match is
        # already string-verified by the filter above, and bench_grams
        # is distinct per string, so this keeps the aggregation shuffle
        # fixed-width (two colliding benchmark grams could undercount a
        # doc's hits by one — the FLAG is unaffected)
        .agg(F.count_distinct("_gh").alias("_n_hit"))
    )
    out = df.join(matches, df[id_col] == matches["_id"], "left")
    return (
        out.withColumn(
            "n_contaminated_ngrams", F.coalesce(F.col("_n_hit"), F.lit(0))
        )
        .withColumn("contaminated", F.col("n_contaminated_ngrams") > 0)
        .drop("_id", "_n_hit")
    )


def dedup_against_corpus(
    batch: DataFrame,
    corpus_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup of a new batch against an existing corpus.

    Keeps batch rows that are (a) the min-id representative of their
    normalized text WITHIN the batch and (b) absent from the corpus
    fingerprint index (``corpus_index`` needs only a ``fingerprint``
    column — build it with :func:`with_fingerprint` or read it back via
    ``sources.bucketed.read_table`` from a
    :func:`~top_secret_spark.sources.bucketed.write_fingerprint_index`
    table).

    Scale shape (the reason this exists as its own operator): at 10^12
    corpus rows the index dwarfs every incoming batch, so the join that
    must not shuffle is the CORPUS side.  With the index stored bucketed
    by ``fingerprint`` the left-anti join reads corpus buckets in place
    and only the (small) batch is exchanged; nothing ever shuffles
    document bodies — the anti-join carries 8-byte fingerprints.  The
    within-batch stage is the same min-id representative rule as
    :func:`dedup_exact`, so re-running a batch is idempotent.
    """
    fp = with_fingerprint(batch, text_col)
    reps = fp.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    survivors = fp.join(reps, ["fingerprint", id_col], "inner")
    return survivors.join(
        corpus_index.select("fingerprint"), "fingerprint", "left_anti"
    ).drop("fingerprint")


# --- MinHash -------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_SHINGLE_BUCKETS = 1 << 32


def _minhash_params(num_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    # odd uint64 multipliers → multiply-shift universal hash family; ~20x
    # cheaper than affine-mod-Mersenne (no 64-bit modulo in the hot loop)
    a = rng.integers(1, 1 << 63, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_hashes, dtype=np.uint64)
    return a, b


def make_minhash_udf(num_hashes: int = 64, shingle_k: int = 5, seed: int = 42):
    """MinHash signature UDF: text → array<long> of length num_hashes.

    Char-k-gram shingles over normalized text, hashed to 32 bits, then
    num_hashes independent multiply-shift permutations
    ((a*x+b) mod 2^64 >> 3, odd a).  Deterministic: params derive from
    the seed only, so signatures are identical across partitions,
    retries, and cluster sizes."""
    a, b = _minhash_params(num_hashes, seed)

    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash(texts: pd.Series) -> pd.Series:
        from ..kernel.hashing import encode_batch, ngram_hashes

        normed = [" ".join((t or "").lower().split()) for t in texts.tolist()]
        data, lengths = encode_batch(normed)
        doc_idx, h = ngram_hashes(data, lengths, shingle_k, _SHINGLE_BUCKETS)
        # sentinel > any (a*x+b) >> 3 value (which is < 2^61) — fits int64
        sigs = np.full((len(normed), num_hashes), 1 << 62, dtype=np.uint64)
        if len(h):
            # doc_idx is NONDECREASING by construction (n-gram positions
            # come out in document order), so per-doc mins are one
            # reduceat over the raw run starts — no sort, and no per-doc
            # shingle dedup either (the min over a multiset equals the
            # min over its distinct set).  One reused full-length tmp
            # column per permutation (in-place multiply/add/shift +
            # reduceat) replaces the (chunk × num_hashes) matrix this
            # rewrote: that layout materialized and re-read a 33 MB
            # block per chunk and measured ~9x slower.
            h_u = h.astype(np.uint64)
            seg = np.flatnonzero(np.r_[True, doc_idx[1:] != doc_idx[:-1]])
            docs = doc_idx[seg]
            tmp = np.empty(len(h_u), dtype=np.uint64)
            for j in range(num_hashes):
                np.multiply(h_u, a[j], out=tmp)
                tmp += b[j]
                tmp >>= np.uint64(3)
                sigs[docs, j] = np.minimum.reduceat(tmp, seg)
        return pd.Series(list(sigs.astype(np.int64)))

    return minhash


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    return df.withColumn(
        "minhash", make_minhash_udf(num_hashes, shingle_k)(F.col(text_col))
    )


def _banded(sig_df: DataFrame, id_col: str, sig_col: str, bands: int) -> DataFrame:
    """(id, band, bucket) rows: signature sliced into `bands` chunks,
    each chunk hashed with the band index as seed — the ONE banding
    expression shared by candidate generation and oversize accounting
    (same bands ⇒ same buckets)."""
    sig = F.col(sig_col)
    n = F.size(sig)
    rows_per_band = (n / bands).cast("int")
    return sig_df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(F.slice(sig, i * rows_per_band + 1, rows_per_band), i),
            )
        ).alias("band", "bucket"),
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 16,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded LSH: split the signature into `bands` rows-per-band chunks,
    hash each chunk, self-join ids sharing any (band, hash) bucket →
    distinct (a, b) candidate pairs with a < b.

    The shuffle key is (band, bucket_hash) — small and well distributed;
    pair expansion is a codegen'd self-JOIN on the bucket key (not an
    in-expression nested loop), so a giant bucket is handled by the join
    machinery and AQE skew splitting instead of one quadratic expression
    evaluated on a single row.  ``max_bucket`` (optional, off by default)
    drops buckets larger than the cap — complete subgraphs of
    near-identical docs, better collapsed by exact dedup first; callers
    that cap should count dropped buckets via
    ``lsh_oversize_buckets(sig_df, ..., bands=<same bands>)`` and surface
    the number, never cap silently.
    """
    banded = _banded(sig_df, id_col, sig_col, bands)
    if max_bucket is not None:
        # broadcast the OVERSIZE set (tiny by construction — these are the
        # rare mega-buckets) and anti-join; broadcasting the keep-side
        # would ship ~one row per (doc, band) and blow the broadcast limit
        # at scale.
        oversize = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") > max_bucket)
            .select("band", "bucket")
        )
        banded = banded.join(
            F.broadcast(oversize), ["band", "bucket"], "left_anti"
        )
    left = banded.select("band", "bucket", F.col(id_col).alias("a"))
    right = banded.select("band", "bucket", F.col(id_col).alias("b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def lsh_oversize_buckets(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    bands: int = 16,
    max_bucket: int = 4096,
) -> DataFrame:
    """(band, bucket, n) rows for buckets a ``max_bucket`` cap would drop
    — the accounting side of capped candidate generation.  Pass the SAME
    ``bands`` used for lsh_candidate_pairs (or the value
    ``_auto_bands(num_hashes, threshold)`` resolved to)."""
    return (
        _banded(sig_df, id_col, sig_col, bands)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket)
    )


def minhash_similarity_col(sig_a, sig_b):
    """Estimated Jaccard = fraction of agreeing signature positions."""
    return F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y),
                           lambda v: v)) / F.size(sig_a)


def _auto_bands(num_hashes: int, threshold: float, min_detect: float = 0.9) -> int:
    """Largest rows-per-band r whose detection probability for an
    AT-THRESHOLD pair, 1-(1-t^r)^b, still meets ``min_detect`` — larger r
    sharply cuts sub-threshold candidate collisions (the cost driver at
    web scale) but must not sacrifice recall at the threshold itself.
    E.g. num_hashes=64: t=0.999 → b=2 (r=32, detect≈1.0); t=0.9 → b=8
    (r=8, detect .989); t=0.8 → b=16 (r=4, detect .998 — r=8 would
    detect only .77 of threshold-similarity pairs)."""
    for r in range(num_hashes, 0, -1):
        if num_hashes % r:
            continue
        b = num_hashes // r
        if b >= 2 and 1.0 - (1.0 - threshold**r) ** b >= min_detect:
            return b
    return num_hashes  # r=1: every position its own band (recall-max)


def near_duplicates_minhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int | None = None,
    collapse_exact: bool | str = False,
    collapse_min_dup_ratio: float = 0.2,
    materialize: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """End-to-end MinHash near-dup: signatures → LSH candidates →
    signature-estimated Jaccard filter → (a, b, est_jaccard).

    Signatures are computed once and persisted — they feed candidate
    generation AND both sides of the pair join; without the persist the
    (expensive) signature UDF would run three times.  Candidate pairs
    have a single downstream consumer (the verify join) and flow through
    unpersisted — except when ``stats`` is requested, where the count
    action would otherwise recompute the LSH shuffle.  The returned
    frame is eagerly localCheckpoint-ed (it is small: above-threshold
    pairs only) so the intermediates can be UNPERSISTED before
    returning — repeated invocations do not accumulate cached datasets.

    ``collapse_exact=True`` pre-collapses identical signatures to one
    representative before LSH: the banding shuffle, bucket self-join and
    verify join then scale with UNIQUE documents, and representative
    pairs are expanded back through group membership afterwards.  Output
    is identical to the uncollapsed path (group members share one
    signature, so every expanded pair has the representative pair's
    est_jaccard, and intra-group pairs are est 1.0 ≥ any threshold ≤ 1).
    This is the scale switch for corpora with heavy exact duplication —
    web crawls routinely >30% — where mega duplicate groups otherwise
    flood every one of their LSH buckets.  Groups are keyed on the FULL
    signature array, not a 64-bit hash of it: at 10^11+ docs a 64-bit
    collision would silently merge docs with different signatures into
    one "exact" group and emit false est_jaccard=1.0 pairs.

    On a corpus with LITTLE exact duplication, collapsing is pure
    overhead (the array-keyed groupBy + membership joins run for
    nothing — measured ~2× slower on a 98%-unique table), so
    ``collapse_exact="auto"`` probes first: one approx-distinct
    aggregate over 64-bit signature digests (collisions only perturb a
    ratio estimate — never correctness) and collapses only when the
    duplicate fraction is ≥ ``collapse_min_dup_ratio``.  This is the
    recommended setting for unknown corpora; the probe costs one pass
    over the persisted signatures.

    ``materialize=False`` returns the result lazily instead of the
    default eager ``localCheckpoint``; the intermediates then stay
    persisted (unpersisting them would force recomputation through the
    lazy result), so callers should write/consume the frame promptly
    and may ``spark.catalog.clearCache()`` afterwards.  Use it when the
    pair set may be large — e.g. ``collapse_exact`` over corpora with
    mega duplicate groups, where member-pair expansion is quadratic in
    group size — or when the result feeds straight into another job
    stage; the default keeps small-result ergonomics (eager, executor-
    local, no cache accumulation across invocations) at the cost of
    fault-tolerance of the checkpointed blocks.
    """
    from pyspark import StorageLevel

    # A small parquet scan can land in fewer splits than cores, which
    # would serialize the signature UDF; spread it first.  At 100 TB the
    # scan already yields >> cores splits and this is a no-op.
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        df = df.repartition(cores)

    all_sigs = (
        with_minhash(df, text_col, num_hashes)
        .select(id_col, "minhash")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if collapse_exact == "auto":
        probe = all_sigs.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(F.xxhash64("minhash")).alias("u"),
        ).collect()[0]
        n_docs, n_unique = probe["n"], probe["u"]
        dup_ratio = (n_docs - n_unique) / max(n_docs, 1)
        collapse_exact = dup_ratio >= collapse_min_dup_ratio
        if stats is not None:
            stats["exact_dup_ratio"] = round(dup_ratio, 4)
    elif not isinstance(collapse_exact, bool):
        raise ValueError(
            f"collapse_exact must be True, False, or 'auto', got "
            f"{collapse_exact!r}"
        )
    if stats is not None:
        stats["collapsed_exact"] = collapse_exact
    extra_pairs = None
    if collapse_exact:
        # group key is the signature ARRAY itself (array<long> is a valid
        # shuffle/grouping key) — a 64-bit digest here would merge
        # colliding-but-different signatures at 10^11+ doc scale
        reps = all_sigs.groupBy("minhash").agg(F.min(id_col).alias(id_col))
        sigs = reps.select(id_col, "minhash").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        members = all_sigs.select(
            F.col("minhash").alias("_sig"), F.col(id_col).alias("_member")
        )
        # intra-group pairs: identical signatures → est 1.0
        ml = members.select("_sig", F.col("_member").alias("a"))
        mr = members.select("_sig", F.col("_member").alias("b"))
        extra_pairs = (
            ml.join(mr, "_sig")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", F.lit(1.0).alias("est_jaccard"))
        )
    else:
        sigs = all_sigs
        members = None

    # pairs has ONE downstream consumer (the verify join), so it is NOT
    # persisted in the plain path — a persist + materialize there is a
    # pure extra job barrier.  With a stats request the count() action
    # would otherwise recompute the LSH shuffle, so persist first.
    pairs = lsh_candidate_pairs(
        sigs, id_col, bands=bands or _auto_bands(num_hashes, threshold)
    )
    pairs_persisted = False
    if stats is not None:
        # candidate volume is THE cost driver at web scale — callers
        # (bench, ops dashboards) surface it
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        pairs_persisted = True
        stats["n_candidate_pairs"] = pairs.count()
        if collapse_exact:
            stats["n_unique_signatures"] = sigs.count()
    sa = sigs.select(F.col(id_col).alias("a"), F.col("minhash").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("minhash").alias("sig_b"))
    verified = (
        pairs.join(sa, "a").join(sb, "b")
        .withColumn("est_jaccard", minhash_similarity_col(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )
    if collapse_exact:
        # expand representative pairs through group membership (each rep
        # pair fans out to |group_a| x |group_b| member pairs); the rep →
        # member join key is the signature array (reps carry it already)
        ga = sigs.select(F.col(id_col).alias("a"), F.col("minhash").alias("_sa"))
        gb = sigs.select(F.col(id_col).alias("b"), F.col("minhash").alias("_sb"))
        expanded = (
            verified.join(ga, "a").join(gb, "b")
            .join(members.select(F.col("_sig").alias("_sa"),
                                 F.col("_member").alias("ma")), "_sa")
            .join(members.select(F.col("_sig").alias("_sb"),
                                 F.col("_member").alias("mb")), "_sb")
            .select(
                F.least("ma", "mb").alias("a"),
                F.greatest("ma", "mb").alias("b"),
                "est_jaccard",
            )
        )
        verified = expanded.unionByName(extra_pairs)
    result = verified.select(
        "a", "b", F.round("est_jaccard", 6).alias("est_jaccard")
    )
    if not materialize:
        return result
    result = result.localCheckpoint(eager=True)
    if pairs_persisted:
        pairs.unpersist()
    if sigs is not all_sigs:  # plain path: sigs IS all_sigs
        sigs.unpersist()
    all_sigs.unpersist()
    return result


# --- near-dup cluster resolution -------------------------------------------------


def near_duplicate_clusters(
    pairs: DataFrame, max_iterations: int = 30
) -> DataFrame:
    """Connected components over near-dup pairs → (node, cluster_id).

    ``pairs`` is an (a, b) edge frame (e.g. from
    ``near_duplicates_minhash``); output assigns every endpoint the MIN
    id of its connected component — the deterministic survivor rule that
    turns pairwise near-dup evidence into actual deduplication.

    Iterative min-label propagation WITH pointer jumping: each round
    every node takes the min of (its own label, its neighbors' labels,
    its label's label).  Neighbor propagation spreads the component
    minimum one hop per round; the label-of-label step halves the
    remaining pointer chains (classic pointer jumping), so convergence
    is O(log n) rounds even for pathological chain-shaped components —
    ``max_iterations`` = 30 covers components of ~2^30 nodes.  Each
    round is two joins + a groupBy on (node, label) longs only (never
    text).  Labels are ``localCheckpoint``-ed every round to truncate
    lineage (plan growth is otherwise exponential in rounds);
    convergence is detected via the strictly-decreasing label sum, one
    cheap aggregate per round."""
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select("src").distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(max_iterations):
        nbr = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("label").alias("_nl")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("_nl").alias("_min_nbr"))
        )
        # pointer jumping: label of my label (labels are node ids by
        # construction, so this is a self-join on the label column)
        lol = labels.select(
            F.col("node").alias("_lnode"), F.col("label").alias("_ll")
        )
        labels = (
            labels.join(
                nbr.select(F.col("src").alias("node"), "_min_nbr"),
                "node",
                "left",
            )
            .join(lol, F.col("label") == F.col("_lnode"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce("_min_nbr", "label"),
                    F.coalesce("_ll", "label"),
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select("node", F.col("label").alias("cluster_id"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"near_duplicate_clusters did not converge in {max_iterations} rounds"
    )


def dedup_near(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int | None = None,
    collapse_exact: bool | str = "auto",
    verify_exact: bool = False,
    shingle_k: int = 5,
    method: str = "minhash",
    max_distance: int = 3,
) -> DataFrame:
    """Fuzzy deduplication end-to-end: near-dup pairs → connected
    components → keep ONE survivor (min id) per cluster, plus every
    document in no cluster.  The fuzzy twin of ``dedup_exact`` —
    pairwise near-dup evidence alone cannot deduplicate a corpus; this
    is the step a training-data pipeline actually runs.

    ``method`` picks the sketch: ``"minhash"`` (default; Jaccard ≥
    ``threshold``) or ``"simhash"`` (Hamming ≤ ``max_distance`` on the
    64-bit sketch — 8 bytes/doc, the cheaper sketch at extreme scale).

    ``verify_exact=True`` re-checks every estimated pair with TRUE
    shingle Jaccard (text joined back for candidates only) before
    clustering — sketch-estimated similarity has a known false-positive
    rate, and a single false edge merges two whole clusters, so
    verification matters more here than for pair reporting.

    The drop set (non-survivor cluster members) is joined back
    ``left_anti`` on the id column — the only thing shuffled against
    the corpus is 8-byte ids."""
    if method == "minhash":
        pairs = near_duplicates_minhash(
            df, id_col, text_col, threshold, num_hashes, bands, collapse_exact
        )
    elif method == "simhash":
        pairs = near_duplicates_simhash(
            df, id_col, text_col, max_distance
        )
    else:
        raise ValueError(
            f"method must be 'minhash' or 'simhash', got {method!r}"
        )
    if verify_exact:
        pairs = verify_pairs_jaccard(
            pairs, df, id_col, text_col, threshold, shingle_k
        ).select("a", "b")
    clusters = near_duplicate_clusters(pairs)
    drop = (
        clusters.filter(F.col("node") != F.col("cluster_id"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(drop, id_col, "left_anti")


# --- exact n-gram Jaccard verification ------------------------------------------


def make_jaccard_udf(shingle_k: int = 5):
    """Exact shingle-Jaccard UDF over (text_a, text_b) pairs — fully
    vectorized per Arrow batch: ONE ``encode_batch`` + ``ngram_hashes``
    pass over all 2n texts, then per-pair intersection/union via sorted
    (pair, shingle) arrays.  No per-text encode calls, no Python sets —
    this UDF sits on the ``dedup_near(verify_exact=True)`` clustering
    path where candidate volume can be O(corpus) after LSH."""

    @pandas_udf(T.DoubleType())
    def jaccard(text_a: pd.Series, text_b: pd.Series) -> pd.Series:
        from ..kernel.hashing import pair_jaccard

        return pd.Series(
            pair_jaccard(
                text_a.tolist(), text_b.tolist(), shingle_k, _SHINGLE_BUCKETS
            )
        )

    return jaccard


def verify_pairs_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> DataFrame:
    """Join text back for candidate pairs only and compute exact shingle
    Jaccard — the verification stage after LSH candidate generation."""
    docs = df.select(F.col(id_col), F.col(text_col))
    ta = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("text_a"))
    tb = docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("text_b"))
    j = make_jaccard_udf(shingle_k)
    return (
        pairs.join(ta, "a").join(tb, "b")
        .withColumn("jaccard", j(F.col("text_a"), F.col("text_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def verify_pairs_levenshtein(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_edits: int = 3,
) -> DataFrame:
    """Exact edit-distance verification for near-dup candidate pairs —
    the ASR-transcript counterpart of :func:`verify_pairs_jaccard`.
    Two transcriptions of the same recording differ by a handful of
    character edits (casing fixed upstream, a dropped filler word, one
    misheard token), which shingle-Jaccard under-resolves on short
    strings; an edit-distance budget is the natural verify metric for
    a transcript dedup family.

    Fully JVM-side: ``levenshtein(a, b, threshold)`` is a Catalyst
    expression (codegen'd, early-exits the DP once the running minimum
    exceeds the budget, so cost is O(len x max_edits) not O(len^2)),
    guarded by a length-difference prefilter — ``|len(a) - len(b)| >
    max_edits`` is an edit-distance lower bound, so those pairs are
    discarded before paying any DP at all.  No Python anywhere.

    Scale: only candidate pairs (LSH output) ever join text back, and
    each side joins on the 8-byte id — the same shape as
    ``verify_pairs_jaccard``.  Output keeps ``edits`` for audit.
    """
    if max_edits < 0:
        raise ValueError(f"max_edits must be >= 0, got {max_edits}")
    docs = df.select(F.col(id_col), F.col(text_col))
    ta = docs.select(F.col(id_col).alias("a"), F.col(text_col).alias("text_a"))
    tb = docs.select(F.col(id_col).alias("b"), F.col(text_col).alias("text_b"))
    lev = F.levenshtein(F.col("text_a"), F.col("text_b"), max_edits)
    return (
        pairs.join(ta, "a").join(tb, "b")
        .filter(
            F.abs(F.length("text_a") - F.length("text_b")) <= max_edits
        )
        # thresholded levenshtein returns -1 once the budget is blown
        .withColumn("edits", lev)
        .filter((F.col("edits") >= 0) & (F.col("edits") <= max_edits))
        .select("a", "b", "edits")
    )


# --- SimHash --------------------------------------------------------------------


def make_simhash_udf(shingle_k: int = 4):
    """64-bit SimHash over char shingles (Charikar 2002): sum ±1 per bit
    weighted by shingle occurrence; sign → bit."""

    @pandas_udf(T.LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        from ..kernel.hashing import encode_batch, ngram_hashes

        normed = [" ".join((t or "").lower().split()) for t in texts.tolist()]
        data, lengths = encode_batch(normed)
        ndocs = len(normed)
        acc = np.zeros((ndocs, 64), dtype=np.int64)
        doc_idx, h = ngram_hashes(data, lengths, shingle_k, 1 << 62)
        if len(h):
            # spread 62-bit hash to 64 sign bits via two mixes
            h1 = h.astype(np.uint64)
            h2 = (h1 * np.uint64(0x9E3779B97F4A7C15)) & np.uint64((1 << 64) - 1)
            bits = np.zeros((len(h), 64), dtype=np.int8)
            for i in range(32):
                bits[:, i] = ((h1 >> np.uint64(i)) & np.uint64(1)).astype(np.int8)
                bits[:, 32 + i] = ((h2 >> np.uint64(i)) & np.uint64(1)).astype(np.int8)
            signs = bits.astype(np.int64) * 2 - 1
            np.add.at(acc, doc_idx, signs)
        out = np.zeros(ndocs, dtype=np.uint64)
        for i in range(64):
            out |= ((acc[:, i] > 0).astype(np.uint64)) << np.uint64(i)
        return pd.Series(out.astype(np.int64))

    return simhash


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("simhash", make_simhash_udf()(F.col(text_col)))


def _simhash_banded(
    df: DataFrame, id_col: str, hash_col: str, band_bits: int
) -> DataFrame:
    """(id, band, bucket) rows: the 64-bit SimHash sliced into
    64/band_bits bands — the one banding expression shared by candidate
    generation and oversize accounting."""
    bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col(hash_col), i * band_bits).bitwiseAND(mask)
                for i in range(bands)
            ])
        ).alias("band", "bucket"),
    )


def simhash_candidate_pairs(
    df: DataFrame, id_col: str = "doc_id", hash_col: str = "simhash",
    band_bits: int = 16, max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup candidates = docs sharing any 16-bit band of the 64-bit
    SimHash (catches pairs within Hamming distance 3 with certainty when
    the differing bits span ≤3 bands).

    Pair expansion is a codegen'd self-JOIN on the (band, bucket) key —
    exactly the ``lsh_candidate_pairs`` shape — NOT a collect_list +
    nested-transform expansion: a mega-bucket (heavy exact duplication,
    the norm in web crawls) is handled by the join machinery and AQE
    skew splitting instead of materializing O(n²) structs from one row
    on one executor.  ``max_bucket`` (optional) drops oversize buckets;
    count them via ``simhash_oversize_buckets`` with the SAME band_bits
    — never cap silently."""
    banded = _simhash_banded(df, id_col, hash_col, band_bits)
    if max_bucket is not None:
        oversize = (
            banded.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") > max_bucket)
            .select("band", "bucket")
        )
        banded = banded.join(
            F.broadcast(oversize), ["band", "bucket"], "left_anti"
        )
    left = banded.select("band", "bucket", F.col(id_col).alias("a"))
    right = banded.select("band", "bucket", F.col(id_col).alias("b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash_oversize_buckets(
    df: DataFrame, id_col: str = "doc_id", hash_col: str = "simhash",
    band_bits: int = 16, max_bucket: int = 4096,
) -> DataFrame:
    """(band, bucket, n) rows a ``max_bucket`` cap would drop — the
    accounting side of capped SimHash candidate generation."""
    return (
        _simhash_banded(df, id_col, hash_col, band_bits)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket)
    )


def hamming_distance_col(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def near_duplicates_simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    band_bits: int = 16,
    max_bucket: int | None = None,
    materialize: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """End-to-end SimHash near-dup: 64-bit sketches → band-bucket
    candidates → Hamming verify → (a, b, hamming) pairs with
    hamming ≤ ``max_distance`` — the cheaper-sketch twin of
    ``near_duplicates_minhash`` (8 bytes/doc vs 8·num_hashes).

    Recall is EXACT for the default parameters: with 64/16 = 4 bands,
    any pair within Hamming distance 3 differs in at most 3 bands, so
    by pigeonhole at least one band matches and the pair is generated
    (general rule: full recall whenever max_distance < 64/band_bits).
    Sketches are persisted once and reused by banding and both verify
    sides; the result is eagerly localCheckpoint-ed (≤-max_distance
    pairs only) so intermediates are unpersisted before returning.
    ``materialize=False`` returns lazily and leaves the persist in
    place (see near_duplicates_minhash).  Feed the pairs to
    ``near_duplicate_clusters`` / ``dedup_near(method='simhash')`` for
    actual survivor selection."""
    from pyspark import StorageLevel

    if max_distance >= 64 // band_bits:
        # still usable, but recall is no longer guaranteed — surface it
        import warnings

        warnings.warn(
            f"max_distance={max_distance} >= 64/band_bits="
            f"{64 // band_bits}: pairs whose differing bits span every "
            f"band can be missed; lower band_bits for guaranteed recall",
            stacklevel=2,
        )
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        df = df.repartition(cores)
    sigs = (
        with_simhash(df, text_col)
        .select(id_col, "simhash")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs = simhash_candidate_pairs(
        sigs, id_col, "simhash", band_bits, max_bucket
    )
    pairs_persisted = False
    if stats is not None:
        pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
        pairs_persisted = True
        stats["n_candidate_pairs"] = pairs.count()
    sa = sigs.select(F.col(id_col).alias("a"), F.col("simhash").alias("_ha"))
    sb = sigs.select(F.col(id_col).alias("b"), F.col("simhash").alias("_hb"))
    result = (
        pairs.join(sa, "a").join(sb, "b")
        .withColumn(
            "hamming",
            hamming_distance_col(F.col("_ha"), F.col("_hb")).cast("int"),
        )
        .filter(F.col("hamming") <= max_distance)
        .select("a", "b", "hamming")
    )
    if not materialize:
        return result
    result = result.localCheckpoint(eager=True)
    if pairs_persisted:
        pairs.unpersist()
    sigs.unpersist()
    return result


# --- embedding-cosine near-dup ----------------------------------------------------


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_bits: int = 8,
    exact: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity → (a, b, cos).

    Scale path (default): bucket by random-hyperplane LSH signature
    (operators/similarity.py), pair only within buckets — at high
    thresholds near-dups almost surely share all sign bits, so the
    candidate volume shrinks ~2^-n_bits while recall stays high.
    ``exact=True`` skips bucketing (full O(n²) pair join) for small
    inputs and for measuring LSH recall."""
    from .similarity import with_lsh_bucket

    # width gate BEFORE either path: the LSH path NULL-buckets ragged
    # vectors, but the exact=True O(n^2) join would happily pair two
    # wrong-width vectors of MATCHING width (zip_with truncates to the
    # shorter array) — and exact mode is the LSH-recall baseline, so an
    # overcount there corrupts the recall measurement itself
    df = df.filter(F.size(F.col(emb_col)) == dim)

    if exact:
        left = df.select(F.col(id_col).alias("a"), F.col(emb_col).alias("ea"))
        right = df.select(F.col(id_col).alias("b"), F.col(emb_col).alias("eb"))
        pairs = left.join(right, F.col("a") < F.col("b"))
    else:
        b = with_lsh_bucket(df, dim, emb_col, n_bits)
        left = b.select(
            F.col(id_col).alias("a"), F.col(emb_col).alias("ea"),
            F.col("lsh_bucket").alias("ba"),
        )
        right = b.select(
            F.col(id_col).alias("b"), F.col(emb_col).alias("eb"),
            F.col("lsh_bucket").alias("bb"),
        )
        pairs = left.join(
            right, (F.col("ba") == F.col("bb")) & (F.col("a") < F.col("b"))
        )
    # cosine in pure Catalyst: zip_with dot products + aggregate norms
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(
        F.transform("ea", lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(
        F.transform("eb", lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    # try_divide: a zero-norm vector (all-zeros embedding) must read
    # cos=NULL and fall out of the threshold filter — under ANSI mode
    # (Spark 4 default) a plain division would abort the whole job on
    # DIVIDE_BY_ZERO for one degenerate row.  The explicit NaN guard
    # matters because Spark orders NaN ABOVE every number: a NaN cosine
    # (non-finite embedding component) would pass any >= threshold
    # filter and silently pair the poison row with every candidate.
    cos = F.try_divide(dot, na * nb)
    return (
        pairs.withColumn("cos", cos)
        .filter((~F.isnan(F.col("cos"))) & (F.col("cos") >= threshold))
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )


def flag_contaminated_fuzzy(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    threshold: float = 0.8,
    num_hashes: int = 64,
    shingle_k: int = 5,
    bands: int | None = None,
) -> DataFrame:
    """Paraphrase-robust eval decontamination: flag corpus docs whose
    MinHash-estimated Jaccard vs ANY benchmark doc reaches
    ``threshold`` — the fuzzy twin of :func:`flag_contaminated` (exact
    n-gram hits), catching lightly-edited eval leaks the exact probe
    misses.  Appends ``contaminated_fuzzy`` and ``n_bench_near``.

    Scale shape — the corpus NEVER self-joins and its text never
    shuffles: both sides get signatures (one Arrow pass each), the
    BENCHMARK side's banded rows and signatures are BROADCAST (eval
    sets are small by definition — thousands of rows, not billions),
    candidates come from a corpus-banded × bench-banded bucket join,
    and the verify step compares signatures only.  Per corpus doc the
    output is a boolean + count via one groupBy on the 8-byte id."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    btc = bench_text_col or text_col
    b = bands or _auto_bands(num_hashes, threshold)
    mk = make_minhash_udf(num_hashes, shingle_k)
    # persist: the signature UDF (the dominant cost — full corpus scan +
    # shingling + num_hashes mins per doc) feeds BOTH the banding pass
    # and the verify join; without the persist one action evaluates it
    # twice (same reasoning as near_duplicates_minhash's all_sigs)
    corpus_sig = df.select(
        F.col(id_col), mk(F.col(text_col)).alias("minhash")
    ).persist()
    bench_sig = benchmark.select(
        F.monotonically_increasing_id().alias("_bid"),
        mk(F.col(btc)).alias("_bsig"),
    ).localCheckpoint(eager=True)  # freeze nondeterministic ids — the
    # bench side is small by contract, so the eager materialization is
    # cheap and both downstream uses (banding + verify) see ONE id set
    cband = _banded(corpus_sig, id_col, "minhash", b)
    bband = _banded(bench_sig, "_bid", "_bsig", b)
    cands = (
        cband.join(
            F.broadcast(bband.withColumnRenamed("_bid", "_b")),
            ["band", "bucket"],
        )
        .select(F.col(id_col), F.col("_b").alias("_bid"))
        .distinct()
    )
    verified = (
        cands.join(corpus_sig, id_col)
        .join(F.broadcast(bench_sig), "_bid")
        .filter(
            minhash_similarity_col(F.col("minhash"), F.col("_bsig"))
            >= F.lit(threshold)
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bench_near"))
        # eager-materialize the verified counts (one narrow row per
        # contaminated doc — bounded by the candidate set, tiny next to
        # the corpus), then release the signature cache: without this
        # the persist leaks cached signature blocks for the application
        # lifetime (near_duplicates_minhash unpersists the same way)
        .localCheckpoint(eager=True)
    )
    corpus_sig.unpersist()
    return (
        df.join(verified, id_col, "left")
        .withColumn(
            "n_bench_near", F.coalesce(F.col("n_bench_near"), F.lit(0))
        )
        .withColumn("contaminated_fuzzy", F.col("n_bench_near") > 0)
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Audit diff between two corpus snapshots → one row per id with
    ``status`` ∈ {'added', 'removed', 'changed', 'unchanged'} plus both
    content fingerprints — the "what moved between yesterday's and
    today's crawl" question every lineage review asks.

    'changed' means the id exists on both sides with a DIFFERENT
    normalized-content fingerprint (``fingerprint_col`` — whitespace /
    case variants compare equal, matching exact dedup's identity).

    Scale: ONE full-outer join co-partitioned on the 8-byte id;
    payloads never shuffle — each side projects (id, fingerprint)
    before the exchange.  Output carries ids + 8-byte hashes only;
    aggregate it or anti-join it back as needed."""
    o = old.select(
        F.col(id_col).alias("_id"),
        fingerprint_col(text_col).alias("old_fingerprint"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        fingerprint_col(text_col).alias("new_fingerprint"),
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("old_fingerprint").isNull(), F.lit("added"))
        .when(F.col("new_fingerprint").isNull(), F.lit("removed"))
        .when(
            F.col("old_fingerprint") == F.col("new_fingerprint"),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col("_id").alias(id_col),
        "old_fingerprint",
        "new_fingerprint",
        status.alias("status"),
    )


def flag_contaminated_bloom(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    id_col: str = "doc_id",
    m_bits: int | None = None,
    k: int = 4,
    max_bench_grams: int = 2_000_000,
) -> DataFrame:
    """:func:`flag_contaminated` with a BLOOM-FILTER pre-filter: the
    benchmark's n-grams are folded into an ``m_bits`` bitmap (``k``
    double-hashed probes per gram) that ships to every task as one
    binary literal, and every corpus n-gram tests its ``k`` bits in
    PURE CATALYST (substring + hex/conv + floor-div bit math, all
    codegen'd) BEFORE any join.  Only grams that pass the bloom — true
    hits plus a tunable sliver of false positives — enter the exact
    string-verified broadcast join, so the verdict is IDENTICAL to
    :func:`flag_contaminated` (the bloom admits supersets, the verify
    join removes the rest; equivalence is oracle-gated at q102 and
    property-tested under a deliberately saturated 64-bit bloom).

    Why this exists at 10^12 rows: the exact operator probes a
    broadcast hash table with EVERY corpus n-gram — ~10^14 probe rows
    through the join operator.  Here the join sees only the bloom
    survivors (|true leaks| + fpp x corpus grams; ~10 bits/gram gives
    fpp < 1%), a 100-1000x cut in join-operator traffic, while the
    bitmap itself is m_bits/8 bytes (128 KiB at the default) versus a
    broadcast hash table of every benchmark gram STRING.  Same
    defaults, same output schema, same guarantees as the exact
    operator; benchmark sides bigger than ``max_bench_grams`` raise
    (eval sets are small by contract — this is the documented
    bounded-input API, like ``batch_scrub``'s guard).

    ``m_bits=None`` (the default) sizes the bitmap to the MEASURED gram
    count — the next power of two >= 10 bits/gram, clamped to
    [2^20, 2^28] — because a fixed default silently saturates: 500k
    grams x 4 probes into 2^20 bits is ~0.5 bits/gram, fill ratio ~1,
    fpp ~1, and the verify join quietly sees the full traffic the bloom
    exists to cut.  Pass an explicit ``m_bits`` to pin the size (tests
    pin tiny blooms to prove saturation-correctness)."""
    bench_grams = (
        benchmark.select(
            F.explode(_word_ngrams(bench_text_col, n)).alias("_gram")
        )
        .distinct()
    )
    n_grams = bench_grams.count()
    if m_bits is None:
        m = 1 << 20
        while m < 10 * n_grams and m < (1 << 28):
            m <<= 1
    else:
        m = int(m_bits)
    if n_grams > max_bench_grams:
        raise ValueError(
            f"benchmark has {n_grams} distinct {n}-grams > max_bench_grams="
            f"{max_bench_grams}: the bloom build collects per-gram bit "
            "positions to the driver. Raise the cap only if the driver "
            "can hold k x that many longs."
        )
    bh1 = F.pmod(F.xxhash64("_gram"), F.lit(m))
    bh2 = F.pmod(F.xxhash64(F.lit(1), "_gram"), F.lit(m))
    pos_rows = (
        bench_grams.select(
            F.explode(
                F.array(*[F.pmod(bh1 + j * bh2, F.lit(m)) for j in range(k)])
            ).alias("_p")
        )
        .distinct()
        .collect()
    )
    bitmap = bytearray(m // 8 + 1)
    for row in pos_rows:
        p = int(row._p)
        bitmap[p >> 3] |= 1 << (p & 7)
    bloom = F.lit(bytes(bitmap))

    doc_grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(_word_ngrams(text_col, n)).alias("_dg"),
    )
    dh1 = F.pmod(F.xxhash64("_dg"), F.lit(m))
    dh2 = F.pmod(F.xxhash64(F.lit(1), "_dg"), F.lit(m))
    probe = None
    for j in range(k):
        p = F.pmod(dh1 + j * dh2, F.lit(m))
        byte_val = F.conv(
            F.hex(F.substring(bloom, (F.floor(p / 8) + 1).cast("int"), 1)),
            16, 10,
        ).cast("bigint")
        # bit test without shiftleft-by-column: floor(byte / 2^bit) % 2
        bit = F.pmod(
            F.floor(byte_val / F.pow(F.lit(2.0), F.pmod(p, 8).cast("double")))
            .cast("bigint"),
            2,
        ) == 1
        probe = bit if probe is None else (probe & bit)

    bench_exact = bench_grams.select(F.xxhash64("_gram").alias("_gh"), "_gram")
    cand = doc_grams.filter(probe).select(
        "_id", F.xxhash64("_dg").alias("_gh"), "_dg"
    )
    matches = (
        cand.join(F.broadcast(bench_exact), "_gh")
        .filter(F.col("_dg") == F.col("_gram"))
        .groupBy("_id")
        .agg(F.count_distinct("_gh").alias("_n_hit"))
    )
    out = df.join(matches, df[id_col] == matches["_id"], "left")
    return (
        out.withColumn(
            "n_contaminated_ngrams", F.coalesce(F.col("_n_hit"), F.lit(0))
        )
        .withColumn("contaminated", F.col("n_contaminated_ngrams") > 0)
        .drop("_id", "_n_hit")
    )
