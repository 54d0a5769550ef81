"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set:
  pipeline        full quality-filter + scrub pipeline over generated clips
                  (text-only; clip count scales with sf)
  pipeline_audio  pipeline incl. G.711/PCM16 decode over a smaller table
  scrub_restore   scrub + restore roundtrip over the documents table
  dedup_minhash   MinHash+LSH near-dup over documents
  cosine_topk     brute-force cosine top-10, 5 queries over embeddings
  global_labels   distributed batch global-label job
  tpch_q1         relational aggregation baseline over lineitem

Measurement protocol (r3): all arms are INTERLEAVED across
$SPARK_GRAFT_BENCH_REPEATS rounds (default 4) and each arm reports its
best round — on a shared VM with minute-scale CPU variance, interleaving
decorrelates an arm from a single bad window and best-of-N is the
faithful estimate of what the code costs.  Round 1 additionally absorbs
per-closure Python-worker spin-up (6-14 s on this host), so the minimum
is always a warm measurement.  Instrumentation (dedup candidate-pair
stats: an extra persist + count + collapse probe) runs in a separate
UNTIMED invocation after the timed rounds — signatures are
deterministic, so the stats describe exactly the timed computation.

Adaptive rounds (round-4 tail): after the configured rounds, the loop
keeps adding interleaved rounds (cap $SPARK_GRAFT_BENCH_MAX_ROUNDS,
default 10) until at least one round ran bracketed by calm
bandwidth probes (both fenceposts <= 0.45 s).  `calm_round` in the
record says whether that happened, so a record whose every sample was
taken inside a neighbor-noise burst self-identifies.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]


def _bandwidth_probe_sec() -> float:
    """Host memory-bandwidth control: one 20M-element numpy multiply.
    ~0.05 s on this VM when calm; observed 8-22 s for hours at a time
    under neighbor contention (load average near zero throughout — the
    interference is external).  Reported in the output so a degraded
    window is visible in the record instead of masquerading as an
    engine regression; tpch_q1 is the JVM-side control, this is the
    Python/numpy-side one."""
    import time as _t

    import numpy as _np

    a = _np.random.rand(20_000_000)
    t0 = _t.perf_counter()
    a * 1.5
    return round(_t.perf_counter() - t0, 3)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("tss-bench")
        .config("spark.sql.shuffle.partitions", str(int(CPUS) * 2))
        .config("spark.sql.adaptive.enabled", "true")
        # 60k rows/Arrow batch (round 5): the kernels now chunk
        # internally (langid._CHUNK_BYTES) so batch size no longer sets
        # their working footprint, and fewer crossings measured ~1.3x
        # the 20k setting for the fused pipeline at local[32]
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "60000")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from top_secret_spark.operators.batch import batch_scrub
    from top_secret_spark.operators.dedup import near_duplicates_minhash
    from top_secret_spark.operators.scrub import with_restore, with_scrub
    from top_secret_spark.operators.similarity import brute_force_top_k
    from top_secret_spark.pipeline import PipelineConfig, run_pipeline
    from top_secret_spark.sources.clips import clips_df
    from top_secret_spark.util import ship_package

    ship_package(spark)
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # Warm the Python workers (numpy/pandas import + model singletons) on
    # every core before any timed section — same policy as
    # tools/pipeline_job.py: steady-state throughput is the metric; a
    # real 10^12-row run amortizes worker startup to nothing.
    cores = spark.sparkContext.defaultParallelism
    warm = clips_df(spark, cores * 64, with_audio=True, partitions=cores)
    run_pipeline(warm, PipelineConfig(include_audio=True)).filter(
        F.col("keep")
    ).count()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "4")))

    # ---- datasets (built/cached once, outside every timed section) ----
    sf_num = float(SF) if SF.replace(".", "").isdigit() else 0.1
    n_text = max(2000, int(2_000_000 * sf_num))
    n_audio = max(500, int(80_000 * sf_num))

    clips = clips_df(spark, n_text, with_audio=False, partitions=cores * 4).cache()
    n = clips.count()
    aclips = clips_df(spark, n_audio, with_audio=True, partitions=cores * 2).cache()
    na = aclips.count()
    # The documents parquet is ONE split at bench sf — measured A/B
    # (sf0.1, best-of-4 warm): 1 partition 0.67 s vs repartition(64)
    # 1.77 s for scrub_restore, because 5k rows / 64 tasks = 78-row
    # Arrow batches whose per-task overhead swamps the 0.08 ms/doc
    # kernel.  At 100 TB the scan yields >> cores splits and the same
    # code runs wide; forcing that shape onto 5k rows would measure
    # scheduler overhead, not the engine.
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
    docs.count()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    emb.count()
    queries = [(r["vec_id"], r["embedding"])
               for r in emb.filter(F.col("vec_id") < 5).collect()]
    msgs = docs.select(
        F.col("doc_id").alias("msg_idx"),
        F.concat(F.col("text"), F.lit(" contact user"),
                 (F.col("doc_id") % 41).cast("string"),
                 F.lit("@example.com")).alias("input"),
    )
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    # ---- arms (plain calls only; no instrumentation inside) ----
    arms = [
        ("pipeline",
         lambda: run_pipeline(clips).filter(F.col("keep")).count()),
        ("pipeline_audio",
         lambda: run_pipeline(aclips, PipelineConfig(include_audio=True))
         .filter(F.col("keep")).count()),
        ("scrub_restore",
         lambda: with_restore(with_scrub(docs, text_col="text"),
                              text_col="scrubbed")
         .filter(F.col("restored_text") == F.col("text")).count()),
        ("dedup_minhash",
         lambda: near_duplicates_minhash(
             docs, threshold=0.8, collapse_exact="auto").count()),
        ("cosine_topk",
         lambda: brute_force_top_k(emb, queries, k=10).count()),
        ("global_labels", lambda: batch_scrub(msgs)[0].count()),
        ("tpch_q1",
         lambda: li.groupBy("l_returnflag", "l_linestatus").agg(
             F.sum("l_quantity"), F.sum("l_extendedprice"),
             F.count(F.lit(1))).count()),
    ]

    extras["host_probe_before_sec"] = _bandwidth_probe_sec()
    results: dict[str, int] = {}
    per_round: dict[str, list[float]] = {name: [] for name, _ in arms}
    # Adaptive rounds: run the configured interleaved rounds, then keep
    # adding rounds (up to $SPARK_GRAFT_BENCH_MAX_ROUNDS, default 10)
    # until at least one round is BRACKETED by calm probes — the shared
    # VM's noise comes in bursts of a few minutes, so a fixed round
    # count launched inside a burst ships a record where every best-of
    # sample is contaminated.  `round_probes_sec` is the fencepost list
    # (probe before round i = probes[i], after = probes[i+1]); a round
    # counts as calm iff both of its fenceposts are under the gate.
    calm_gate = 0.45
    max_rounds = max(repeats, int(os.environ.get(
        "SPARK_GRAFT_BENCH_MAX_ROUNDS", "10")))
    probes = [_bandwidth_probe_sec()]
    rep = 0

    def _any_calm_round() -> bool:
        return any(max(probes[i], probes[i + 1]) <= calm_gate
                   for i in range(rep))

    while rep < repeats or (rep < max_rounds and not _any_calm_round()):
        for name, fn in arms:
            t0 = time.time()
            results[name] = fn()
            per_round[name].append(time.time() - t0)
        probes.append(_bandwidth_probe_sec())
        rep += 1
    repeats = rep
    extras["round_probes_sec"] = probes
    extras["calm_round"] = _any_calm_round()
    extras["host_probe_after_sec"] = _bandwidth_probe_sec()
    for name, _ in arms:
        timings[name] = round(min(per_round[name]), 3)
        extras[f"{name}_rounds"] = [round(v, 3) for v in per_round[name]]

    extras["pipeline_clips_per_sec"] = round(n / timings["pipeline"], 1)
    extras["pipeline_n_clips"] = n
    extras["pipeline_kept"] = results["pipeline"]
    extras["pipeline_audio_clips_per_sec"] = round(
        na / timings["pipeline_audio"], 1)

    # NON-headline extra: the audio-prep transform chain (endpoint trim →
    # utterance split).  Kept OUT of the headline sum so `value` stays
    # arm-for-arm comparable with BENCH_r01/r02; best-of-2 warm, same
    # interleave-free protocol is fine because the chain is map-only
    # (no shuffle to collide with neighbor load)
    from top_secret_spark.operators.audio import (
        split_clips_on_silence,
        trimmed_clips,
    )

    prep = lambda: split_clips_on_silence(
        trimmed_clips(aclips), min_gap_ms=200
    ).count()
    prep()  # warm the closure
    prep_times = []
    for _ in range(2):
        t0 = time.time()
        n_segs = prep()
        prep_times.append(time.time() - t0)
    extras["audio_prep_sec"] = round(min(prep_times), 3)
    # divide by the RAW minimum, not the rounded record value — a
    # sub-millisecond run would round to 0.000 and a few-ms run would
    # distort the rate by up to ~50%
    extras["audio_prep_clips_per_sec"] = round(
        na / max(min(prep_times), 1e-9), 1)
    extras["audio_prep_segments"] = n_segs

    # NON-headline extra: frequency-domain features (blocked batch FFT)
    # and the pure-Catalyst time-mask splice over the same audio corpus.
    # Same best-of-2 warm protocol as audio_prep — both are map-only.
    from top_secret_spark.operators.audio import (
        time_masked_clips,
        with_spectral_features,
    )

    spec = lambda: with_spectral_features(aclips).agg(
        F.count(F.when(F.col("spectral_ok"), 1)),
        F.avg("spectral_flatness"),
    ).collect()
    spec()
    spec_times = []
    for _ in range(2):
        t0 = time.time()
        spec()
        spec_times.append(time.time() - t0)
    extras["spectral_sec"] = round(min(spec_times), 3)
    extras["spectral_clips_per_sec"] = round(na / max(min(spec_times), 1e-9), 1)

    # NON-headline extra: log-mel filterbank extraction — the heaviest
    # per-clip compute in the suite (FFT + mel matmul per frame); the
    # agg keeps the matrices on the executors, only frame counts return.
    from top_secret_spark.operators.audio import with_log_mel

    lmel = lambda: with_log_mel(aclips).agg(
        F.sum("n_mel_frames"),
        F.count(F.when(F.col("mel_ok"), 1)),
    ).collect()
    lmel()
    lmel_times = []
    for _ in range(2):
        t0 = time.time()
        lmel()
        lmel_times.append(time.time() - t0)
    extras["log_mel_sec"] = round(min(lmel_times), 3)
    extras["log_mel_clips_per_sec"] = round(
        na / max(min(lmel_times), 1e-9), 1)

    # NON-headline extra: the fused voice-health stage (pitch + RT60 +
    # SNR behind ONE decode) — the per-clip speech-triage throughput a
    # production gate pays.  Same best-of-2 warm protocol; map-only.
    from top_secret_spark.operators.audio import with_voice_health

    vh = lambda: with_voice_health(aclips).agg(
        F.count(F.when(F.col("pitch_ok"), 1)),
        F.avg("rt60_s"),
        F.avg("snr_est_db"),
    ).collect()
    vh()
    vh_times = []
    for _ in range(2):
        t0 = time.time()
        vh()
        vh_times.append(time.time() - t0)
    extras["voice_health_sec"] = round(min(vh_times), 3)
    extras["voice_health_clips_per_sec"] = round(
        na / max(min(vh_times), 1e-9), 1)

    mask = lambda: time_masked_clips(aclips, mask_ms=200).agg(
        F.sum(F.length("bytes"))
    ).collect()
    mask()
    mask_times = []
    for _ in range(2):
        t0 = time.time()
        mask()
        mask_times.append(time.time() - t0)
    extras["time_mask_sec"] = round(min(mask_times), 3)
    extras["time_mask_clips_per_sec"] = round(
        na / max(min(mask_times), 1e-9), 1)

    # NON-headline extra: codec normalization (transcode to ulaw) over
    # the same audio corpus, and the top-k bigram vocabulary over the
    # documents table.  Same best-of-2 warm protocol — transcode is
    # map-only; vocab's one exchange carries per-mapper term counts.
    from top_secret_spark.operators.audio import transcode_clips
    from top_secret_spark.operators.text_analysis import top_terms

    tcode = lambda: transcode_clips(aclips, "ulaw").agg(
        F.sum(F.length("bytes"))
    ).collect()
    tcode()
    tcode_times = []
    for _ in range(2):
        t0 = time.time()
        tcode()
        tcode_times.append(time.time() - t0)
    extras["transcode_sec"] = round(min(tcode_times), 3)
    extras["transcode_clips_per_sec"] = round(
        na / max(min(tcode_times), 1e-9), 1)

    vocab = lambda: top_terms(docs, k=100, n=2).count()
    vocab()
    vocab_times = []
    for _ in range(2):
        t0 = time.time()
        vocab()
        vocab_times.append(time.time() - t0)
    extras["vocab_topk_sec"] = round(min(vocab_times), 3)
    extras["vocab_docs_per_sec"] = round(
        docs.count() / max(min(vocab_times), 1e-9), 1)

    # NON-headline extras (round 4): spectral-subtraction denoise (the
    # heaviest restoration kernel — two blocked FFT passes + OLA) and
    # fixed-duration example packing (prefix sum + Catalyst slices + the
    # one groupBy payload shuffle) over the same audio corpus; WAV header
    # audit at scan speed over container-wrapped rows.  Same best-of-2
    # warm protocol.
    from top_secret_spark.operators.audio import (
        denoised_clips,
        pack_audio_examples,
        with_wav_header,
    )

    deno = lambda: denoised_clips(aclips).agg(
        F.sum(F.length("bytes")), F.sum("n_frames_denoised")
    ).collect()
    deno()
    deno_times = []
    for _ in range(2):
        t0 = time.time()
        deno()
        deno_times.append(time.time() - t0)
    extras["denoise_sec"] = round(min(deno_times), 3)
    extras["denoise_clips_per_sec"] = round(
        na / max(min(deno_times), 1e-9), 1)

    pcm_clips = aclips.filter(
        (F.col("codec") == "pcm16") & (F.col("sr_hz") == 16000)
    )
    npc = pcm_clips.count()
    pack = lambda: pack_audio_examples(
        pcm_clips, 30_000, codec="pcm16", sr_hz=16000
    ).agg(
        F.sum(F.length("bytes")), F.sum("n_clips")
    ).collect()
    pack()
    pack_times = []
    for _ in range(2):
        t0 = time.time()
        pack()
        pack_times.append(time.time() - t0)
    extras["pack_audio_sec"] = round(min(pack_times), 3)
    extras["pack_audio_clips_per_sec"] = round(
        npc / max(min(pack_times), 1e-9), 1)

    from top_secret_spark.sources.clips import wav_clips_df

    wavs = wav_clips_df(spark, na, partitions=cores * 2).cache()
    wavs.count()
    wav = lambda: with_wav_header(wavs).agg(
        F.count(F.when(F.col("wav_issue").isNull(), 1)), F.sum("data_len")
    ).collect()
    wav()
    wav_times = []
    for _ in range(2):
        t0 = time.time()
        wav()
        wav_times.append(time.time() - t0)
    extras["wav_audit_sec"] = round(min(wav_times), 3)
    extras["wav_audit_clips_per_sec"] = round(
        na / max(min(wav_times), 1e-9), 1)
    wavs.unpersist()

    # untimed stats pass: candidate-pair volume is THE cost driver at web
    # scale — surfaced for dashboards, but never billed to the arm
    dd_stats: dict = {}
    near_duplicates_minhash(
        docs, threshold=0.8, collapse_exact="auto", stats=dd_stats
    ).count()
    extras["dedup_candidate_pairs"] = dd_stats.get("n_candidate_pairs")
    extras["dedup_exact_dup_ratio"] = dd_stats.get("exact_dup_ratio")
    extras["dedup_collapsed_exact"] = dd_stats.get("collapsed_exact")

    # Iceberg runtime availability, recorded every run so the unexecuted
    # Iceberg branch (sources/checkpoint.py) stays visibly gated on the
    # environment: the moment the sandbox gains the runtime jars this
    # flips to "available" and the skipped test suite turns on for free.
    from top_secret_spark.sources.checkpoint import iceberg_available

    extras["iceberg"] = (
        "available" if iceberg_available(spark) else "unavailable"
    )

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF,
        "cores": cores,
        "repeats_best_of": repeats,
        "protocol": "interleaved_best_of_n",
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
