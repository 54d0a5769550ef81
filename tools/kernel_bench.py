"""Kernel micro-benchmark mirroring the reference's bin/benchmark gates
(/root/reference/bin/benchmark:10-20,69-77):

  * per-message filter latency — reference CI gate: <= 350 ms/message
    (with a real MITIE model; ours has no NER model so the comparison is
    generous to the reference)
  * batch vs individual speedup — reference gate: >= 2.5x
    (their batch path shares one model; our batch path amortizes plan
    compilation and the substitution machinery)

Protocol (symmetric by construction — the round-3 record's asymmetry,
batched arms warmed+averaged vs loop arms run once cold, made every
``*_speedup`` unreliable): EVERY arm, batched and loop alike, goes
through ``_timeit`` — one untimed warmup call, then the best of
``ITERATIONS`` timed runs.  Best-of, not mean-of: on a shared VM the
minimum is the least-noise estimator of kernel cost (the mean absorbs
neighbor interference; see BENCH/BASELINE.md's host-probe protocol).
Arms of one comparison run back-to-back so a host-degradation window
hits both or neither.

Calm gating is PER COMPARISON, not per run (round-4 tail change): the
shared VM's calm windows last tens of seconds while the full suite
takes minutes, so a single before/after probe pair around the whole
run could never land a calm record — every attempt shipped
``host_degraded: true`` even though each individual comparison only
needs a few seconds of quiet.  ``_gated`` probes immediately before
and after the arms of ONE comparison and retries just that comparison
(up to ``$KERNEL_BENCH_TRIES``, default 8, waiting
``$KERNEL_BENCH_WAIT`` s between tries) until its own window is calm,
keeping the least-degraded attempt as the fallback.  The symmetric
back-to-back guarantee is unchanged — both arms always share one
window.  ``arm_probes`` in the output records the winning window's
probe per comparison; ``host_degraded`` is true iff ANY comparison
never landed calm.

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from top_secret_spark.kernel.batch import filter_all_local  # noqa: E402
from top_secret_spark.kernel.scrub import filter_text, restore_text  # noqa: E402

# the reference's three benchmark messages are email+credit-card texts
# (bin/benchmark:16-20); same shape here
MESSAGES = [
    "Hi, my email is alice@example.com and my card is 4242-4242-4242-4242.",
    "Contact bob@test.org about the charge on 4141414141414141 today.",
    "Send receipts to carol@mail.example.net; card 4242424242424242 failed.",
]

ITERATIONS = 5

# Per-comparison calm gate (see module docstring).  The 0.45 s gate
# matches the calm watcher's threshold; a calm probe is ~0.05 s.
CALM_GATE_SEC = float(os.environ.get("KERNEL_BENCH_CALM_GATE", "0.45"))
MAX_TRIES = int(os.environ.get("KERNEL_BENCH_TRIES", "8"))
RETRY_WAIT_SEC = float(os.environ.get("KERNEL_BENCH_WAIT", "15"))

# comparison name -> max(probe_before, probe_after) of the kept attempt
ARM_PROBES: dict[str, float] = {}


def _timeit(fn, iterations: int = ITERATIONS) -> float:
    """Symmetric arm timer: one untimed warmup, then best-of-N timed
    runs.  Both arms of every comparison use this — never warm one arm
    and run the other cold."""
    fn()  # warmup (pattern compilation, allocator, caches)
    best = float("inf")
    for _ in range(iterations):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _gated(name: str, *arms):
    """Time the arms of ONE comparison back-to-back inside a single
    probed calm window, retrying the whole comparison when the window
    degrades.  Each arm is ``(fn, iterations)``; returns the list of
    per-arm ``_timeit`` results from the least-degraded attempt.  The
    winning attempt's probe lands in ``ARM_PROBES[name]``."""
    from bench import _bandwidth_probe_sec

    best_probe = None
    best_times = None
    for attempt in range(MAX_TRIES):
        p0 = _bandwidth_probe_sec()
        if p0 > CALM_GATE_SEC and attempt < MAX_TRIES - 1:
            time.sleep(RETRY_WAIT_SEC)
            continue
        times = [_timeit(fn, iterations=iters) for fn, iters in arms]
        probe = max(p0, _bandwidth_probe_sec())
        if best_probe is None or probe < best_probe:
            best_probe, best_times = probe, times
        if probe <= CALM_GATE_SEC:
            break
        if attempt < MAX_TRIES - 1:
            time.sleep(RETRY_WAIT_SEC)
    ARM_PROBES[name] = round(best_probe, 3)
    return best_times


def main():
    from bench import _bandwidth_probe_sec

    host_probe_before = _bandwidth_probe_sec()

    gmap, items = filter_all_local(MESSAGES)
    individual_sec, batch_sec, restore_sec = _gated(
        "scrub",
        (lambda: [filter_text(m) for m in MESSAGES], ITERATIONS),
        (lambda: filter_all_local(MESSAGES), ITERATIONS),
        (lambda: restore_text(items[0][0], gmap), ITERATIONS),
    )

    # pair-Jaccard verify kernel: vectorized batch pass vs the per-pair
    # set loop it replaced (this UDF sits on the
    # dedup_near(verify_exact=True) clustering path)
    import random

    from top_secret_spark.kernel.hashing import (
        encode_batch,
        ngram_hashes,
        pair_jaccard,
    )

    rng = random.Random(11)
    words = [f"tok{i}" for i in range(500)]
    pa = [" ".join(rng.choices(words, k=40)) for _ in range(2000)]
    pb = [a + " tail" if rng.random() < 0.5 else
          " ".join(rng.choices(words, k=40)) for a in pa]

    def jaccard_loop(texts_a, texts_b, k=5, buckets=1 << 32):
        out = []
        for ta, tb in zip(texts_a, texts_b):
            na = " ".join((ta or "").lower().split())
            nb = " ".join((tb or "").lower().split())
            da, la = encode_batch([na])
            db, lb = encode_batch([nb])
            _, ha = ngram_hashes(da, la, k, buckets)
            _, hb = ngram_hashes(db, lb, k, buckets)
            sa, sb = set(ha.tolist()), set(hb.tolist())
            union = len(sa | sb)
            out.append(len(sa & sb) / union if union else 1.0)
        return out

    jac_vec_sec, jac_loop_sec = _gated(
        "jaccard",
        (lambda: pair_jaccard(pa, pb), ITERATIONS),
        (lambda: jaccard_loop(pa, pb), 3),
    )

    # audio feature kernel: one concatenated decode + segmented
    # reductions (the with_audio_features hot path, now including the
    # gate's silence/clipping ratios) vs the per-clip loop it replaced
    import numpy as np

    from top_secret_spark.kernel.audio import (
        audio_features,
        batch_decode,
        decode,
        encode,
        gate_ratios,
        segmented_features,
        segmented_ratios,
        synth_pcm,
    )

    clips = [synth_pcm(i, 4000 + (i * 37) % 4000, 8000) for i in range(400)]
    datas = [encode(c, "ulaw") for c in clips]
    srs = np.full(len(datas), 8000.0)

    def audio_batched():
        samples, lengths = batch_decode(datas, "ulaw")
        segmented_features(samples, lengths, srs)
        segmented_ratios(samples, lengths)

    def audio_loop():
        for d in datas:
            pcm = decode(d, "ulaw")
            audio_features(pcm, 8000)
            gate_ratios(pcm)

    audio_vec_sec, audio_loop_sec = _gated(
        "audio_features",
        (audio_batched, ITERATIONS), (audio_loop, ITERATIONS))

    # pairwise-SNR verify kernel: grouped concatenated decode + cumsum
    # segment powers vs the naive per-pair decode loop
    from top_secret_spark.kernel.audio import batch_pair_snr, snr_db

    pair_n = 300
    # non-dup partners share the length (the candidate key guarantees
    # that) but come from a different source
    others = [
        synth_pcm(10_000 + i, len(clips[i % 400]), 8000)
        for i in range(pair_n)
    ]
    pairs_a = [encode(clips[i % 400], "pcm16") for i in range(pair_n)]
    pairs_b = [
        encode(clips[i % 400] if i % 3 else others[i], "ulaw")
        for i in range(pair_n)
    ]
    ca, cb = ["pcm16"] * pair_n, ["ulaw"] * pair_n

    def snr_loop():
        for da, db in zip(pairs_a, pairs_b):
            snr_db(decode(da, "pcm16"), decode(db, "ulaw"))

    snr_vec_sec, snr_loop_sec = _gated(
        "pair_snr",
        (lambda: batch_pair_snr(pairs_a, pairs_b, ca, cb), ITERATIONS),
        (snr_loop, ITERATIONS))

    # uniform-rate resample kernel (resampled_clips hot path).  The
    # kernel is REGIME-ADAPTIVE (kernel/audio.py BATCH_RESAMPLE_SHORT_CLIP):
    # short clips take the single-gather path (per-numpy-call overhead
    # dominates a tiny interp), long clips per-clip np.interp into one
    # preallocated buffer (tight C loop beats the gather's full-size
    # temporaries).  Bench the short regime where batching is the win;
    # the long regime equals the loop by construction.
    from top_secret_spark.kernel.audio import batch_resample, resample

    rs_n = 2000
    rs_srs = np.array([8000 if i % 3 == 0 else 44100 for i in range(rs_n)],
                      dtype=np.int64)
    rs_clips = [
        synth_pcm(20_000 + i, 80 + (i * 7) % 120, int(rs_srs[i]))
        for i in range(rs_n)
    ]
    rs_samples = np.concatenate(rs_clips)
    rs_lengths = np.array([len(c) for c in rs_clips], dtype=np.int64)

    def resample_loop():
        for c, sr in zip(rs_clips, rs_srs):
            resample(c, int(sr), 16000)

    rs_vec_sec, rs_loop_sec = _gated(
        "resample",
        (lambda: batch_resample(rs_samples, rs_lengths, rs_srs, 16000),
         ITERATIONS),
        (resample_loop, ITERATIONS))

    # loudness-normalize kernel: one reduceat + repeat-multiply pass
    # (normalized_clips hot path) vs a per-clip loop.  SHORT clips, like
    # the resample entry: that is the regime where the batched path's
    # win lives (the kernel is regime-adaptive and dispatches long-clip
    # batches to a per-clip apply by design, so benching long clips
    # would measure loop-vs-loop)
    from top_secret_spark.kernel.audio import batch_normalize_gain

    ng_clips = [
        (synth_pcm(30_000 + i, 80 + (i * 7) % 120, 8000)
         * (0.02 if i % 2 else 1.0)).astype(np.float32)
        for i in range(2000)
    ]
    ng_samples = np.concatenate(ng_clips)
    ng_lengths = np.array([len(c) for c in ng_clips], dtype=np.int64)

    def normalize_loop():
        for c in ng_clips:
            batch_normalize_gain(c, np.array([len(c)]), 0.1, 100.0)

    ng_vec_sec, ng_loop_sec = _gated(
        "normalize",
        (lambda: batch_normalize_gain(ng_samples, ng_lengths, 0.1, 100.0),
         ITERATIONS),
        (normalize_loop, ITERATIONS))

    # silence-trim + voiced-segment kernels: one flatnonzero/diff/
    # searchsorted pass over the concatenated buffer vs per-clip scans
    # (trimmed_clips / split_clips_on_silence hot paths).  Clips carry
    # real padding/gap structure so the hit array is sparse like
    # production audio, not dense synth noise.
    from top_secret_spark.kernel.audio import (
        batch_trim_bounds,
        batch_voiced_segments,
    )

    def _seg_clip(i):
        n = 200 + (i * 13) % 400
        sig = np.full(n, 0.3, dtype=np.float32)
        sig[1::2] = -0.3
        zz = np.zeros(60 + (i % 5) * 30, dtype=np.float32)
        if i % 3 == 0:
            return np.concatenate([zz, sig, zz])
        if i % 3 == 1:
            return np.concatenate([zz, sig, np.zeros(300, np.float32), sig, zz])
        return np.zeros(n, dtype=np.float32)

    tb_clips = [_seg_clip(i) for i in range(2000)]
    tb_samples = np.concatenate(tb_clips)
    tb_lengths = np.array([len(c) for c in tb_clips], dtype=np.int64)

    def trim_loop():
        for c in tb_clips:
            batch_trim_bounds(c, np.array([len(c)]), 0.01)

    tb_vec_sec, tb_loop_sec = _gated(
        "trim",
        (lambda: batch_trim_bounds(tb_samples, tb_lengths, 0.01),
         ITERATIONS),
        (trim_loop, ITERATIONS))

    def seg_loop():
        for c in tb_clips:
            batch_voiced_segments(c, np.array([len(c)]), 0.01, 200)

    sg_vec_sec, sg_loop_sec = _gated(
        "segments",
        (lambda: batch_voiced_segments(tb_samples, tb_lengths, 0.01, 200),
         ITERATIONS),
        (seg_loop, ITERATIONS))

    # spectral: blocked multi-clip FFT vs per-clip kernel calls
    from top_secret_spark.kernel.spectral import batch_spectral

    sp_clips = [synth_pcm(31 + i, 2000 + (i * 17) % 3000, 16000)
                for i in range(1000)]
    sp_samples = np.concatenate(sp_clips)
    sp_lengths = np.array([len(c) for c in sp_clips], dtype=np.int64)

    def spectral_loop():
        for c in sp_clips:
            batch_spectral(c, np.array([len(c)]), 16000)

    sp_vec_sec, sp_loop_sec = _gated(
        "spectral",
        (lambda: batch_spectral(sp_samples, sp_lengths, 16000), ITERATIONS),
        (spectral_loop, ITERATIONS))

    # log-mel / MFCC: one blocked FFT + matmul vs per-clip kernel calls
    from top_secret_spark.kernel.spectral import batch_log_mel, batch_mfcc

    def logmel_loop():
        for c in sp_clips:
            batch_log_mel(c, np.array([len(c)]), 16000)

    lm_vec_sec, lm_loop_sec = _gated(
        "log_mel",
        (lambda: batch_log_mel(sp_samples, sp_lengths, 16000), ITERATIONS),
        (logmel_loop, ITERATIONS))

    (mc_vec_sec,) = _gated(
        "mfcc",
        (lambda: batch_mfcc(sp_samples, sp_lengths, 16000), ITERATIONS))

    # SNR estimate: one lexsort/prefix-sum pass vs per-clip kernel calls
    from top_secret_spark.kernel.audio import batch_snr_estimate

    def snrest_loop():
        for c in sp_clips:
            batch_snr_estimate(c, np.array([len(c)]), 16000)

    se_vec_sec, se_loop_sec = _gated(
        "snr_est",
        (lambda: batch_snr_estimate(sp_samples, sp_lengths, 16000),
         ITERATIONS),
        (snrest_loop, ITERATIONS))

    # rolloff + DC removal: batched vs per-clip kernel calls
    from top_secret_spark.kernel.audio import batch_remove_dc
    from top_secret_spark.kernel.spectral import batch_rolloff

    (ro_vec_sec,) = _gated(
        "rolloff",
        (lambda: batch_rolloff(sp_samples, sp_lengths, 16000), ITERATIONS))

    def dc_loop():
        for c in sp_clips:
            batch_remove_dc(c, np.array([len(c)]), 16000)

    dcv_sec, dcl_sec = _gated(
        "remove_dc",
        (lambda: batch_remove_dc(sp_samples, sp_lengths, 16000), ITERATIONS),
        (dc_loop, ITERATIONS))

    # noise mix: one counter-based RNG pass vs per-clip kernel calls
    from top_secret_spark.kernel.audio import batch_mix_noise

    nm_keys = np.arange(len(sp_clips), dtype=np.uint64) * 2654435761

    def mix_loop():
        for i, c in enumerate(sp_clips):
            batch_mix_noise(c, np.array([len(c)]), nm_keys[i:i + 1], 20.0)

    nm_vec_sec, nm_loop_sec = _gated(
        "mix_noise",
        (lambda: batch_mix_noise(sp_samples, sp_lengths, nm_keys, 20.0),
         ITERATIONS),
        (mix_loop, ITERATIONS))

    # round-4 session-4 kernels: declip, downmix, channel blocks, denoise
    from top_secret_spark.kernel.audio import (
        batch_channel_blocks,
        batch_declip,
        batch_downmix,
    )
    from top_secret_spark.kernel.spectral import batch_denoise

    def declip_loop():
        np.concatenate([
            batch_declip(c, np.array([len(c)]))[0] for c in sp_clips
        ])

    dlp_vec_sec, dlp_loop_sec = _gated(
        "declip",
        (lambda: batch_declip(sp_samples, sp_lengths), ITERATIONS),
        (declip_loop, ITERATIONS))

    def downmix_loop():
        np.concatenate([
            batch_downmix(c, np.array([len(c)]), 2)[0] for c in sp_clips
        ])

    dmx_vec_sec, dmx_loop_sec = _gated(
        "downmix",
        (lambda: batch_downmix(sp_samples, sp_lengths, 2), ITERATIONS),
        (downmix_loop, ITERATIONS))

    def channel_loop():
        for c in sp_clips:
            batch_channel_blocks(c, np.array([len(c)]), 2, 8000)

    chb_vec_sec, chb_loop_sec = _gated(
        "channel_blocks",
        (lambda: batch_channel_blocks(sp_samples, sp_lengths, 2, 8000),
         ITERATIONS),
        (channel_loop, ITERATIONS))

    def denoise_loop():
        np.concatenate([
            batch_denoise(c, np.array([len(c)]), 16000)[0] for c in sp_clips
        ])

    dns_vec_sec, dns_loop_sec = _gated(
        "denoise",
        (lambda: batch_denoise(sp_samples, sp_lengths, 16000), 3),
        (denoise_loop, 3))

    # pitch / reverb / codec-family: session-5 kernels, same
    # symmetric warm+average protocol
    from top_secret_spark.kernel.audio import batch_codec_family, encode
    from top_secret_spark.kernel.spectral import batch_pitch, batch_reverb

    def pitch_loop():
        for c in sp_clips:
            batch_pitch(c, np.array([len(c)]), 16000)

    pt_vec_sec, pt_loop_sec = _gated(
        "pitch",
        (lambda: batch_pitch(sp_samples, sp_lengths, 16000), ITERATIONS),
        (pitch_loop, ITERATIONS))

    def reverb_loop():
        for c in sp_clips:
            batch_reverb(c, np.array([len(c)]), 16000)

    rv_vec_sec, rv_loop_sec = _gated(
        "reverb",
        (lambda: batch_reverb(sp_samples, sp_lengths, 16000), ITERATIONS),
        (reverb_loop, ITERATIONS))

    cf_datas = [encode(c, "pcm16" if i % 2 else "ulaw")
                for i, c in enumerate(sp_clips)]

    def codecfam_loop():
        for d in cf_datas:
            batch_codec_family([d])

    cf_vec_sec, cf_loop_sec = _gated(
        "codec_family",
        (lambda: batch_codec_family(cf_datas), ITERATIONS),
        (codecfam_loop, ITERATIONS))

    # IMA-ADPCM decode: the dispatcher's two arms measured against each
    # other — audioop's C loop (the fast path when the stdlib has it)
    # vs the self-contained numpy sample-major scan (the durable 3.13+
    # fallback).  The scan pays per-iteration numpy overhead on every
    # SAMPLE index and only amortizes across the batch axis, so the C
    # loop wins by construction; the record documents how much the
    # fallback costs, it is not a batched-must-win gate.
    from top_secret_spark.kernel import audio as _ka
    from top_secret_spark.kernel.audio import batch_adpcm_decode

    ad_datas = [encode(c, "adpcm") for c in sp_clips]

    def adpcm_numpy_scan():
        saved = _ka._audioop
        _ka._audioop = None
        try:
            batch_adpcm_decode(ad_datas)
        finally:
            _ka._audioop = saved

    ad_c_sec, ad_scan_sec = _gated(
        "adpcm",
        (lambda: batch_adpcm_decode(ad_datas), ITERATIONS),
        (adpcm_numpy_scan, 2))
    adpcm_c_available = _ka._audioop is not None

    host_probe_after = _bandwidth_probe_sec()
    # validity is per comparison: the record is degraded iff some
    # comparison never landed inside its own calm window (run-level
    # before/after probes stay in the record for continuity, but on a
    # flappy host they say nothing about any individual comparison)
    worst_arm_probe = max(ARM_PROBES.values())

    per_message_ms = individual_sec / len(MESSAGES) * 1000
    # the reference's speedup definition (bin/benchmark:54-58):
    # avg individual / avg batch, both per whole message set
    speedup = individual_sec / batch_sec if batch_sec > 0 else float("inf")

    print(json.dumps({
        "per_message_ms": round(per_message_ms, 4),
        "reference_gate_ms": 350,
        "per_message_ok": per_message_ms <= 350,
        "batch_speedup": round(speedup, 3),
        "reference_gate_speedup": 2.5,
        "restore_ms": round(restore_sec * 1000, 4),
        "jaccard_vectorized_pairs_per_sec": round(len(pa) / jac_vec_sec, 1),
        "jaccard_loop_pairs_per_sec": round(len(pa) / jac_loop_sec, 1),
        "jaccard_vectorized_speedup": round(jac_loop_sec / jac_vec_sec, 2),
        "audio_features_batched_clips_per_sec": round(
            len(datas) / audio_vec_sec, 1),
        "audio_features_loop_clips_per_sec": round(
            len(datas) / audio_loop_sec, 1),
        "audio_features_batched_speedup": round(
            audio_loop_sec / audio_vec_sec, 2),
        "pair_snr_batched_pairs_per_sec": round(pair_n / snr_vec_sec, 1),
        "pair_snr_loop_pairs_per_sec": round(pair_n / snr_loop_sec, 1),
        "pair_snr_batched_speedup": round(snr_loop_sec / snr_vec_sec, 2),
        "resample_batched_clips_per_sec": round(
            len(rs_clips) / rs_vec_sec, 1),
        "resample_loop_clips_per_sec": round(
            len(rs_clips) / rs_loop_sec, 1),
        "resample_batched_speedup": round(rs_loop_sec / rs_vec_sec, 2),
        "normalize_batched_clips_per_sec": round(
            len(ng_clips) / ng_vec_sec, 1),
        "normalize_loop_clips_per_sec": round(
            len(ng_clips) / ng_loop_sec, 1),
        "normalize_batched_speedup": round(ng_loop_sec / ng_vec_sec, 2),
        "trim_batched_clips_per_sec": round(len(tb_clips) / tb_vec_sec, 1),
        "trim_loop_clips_per_sec": round(len(tb_clips) / tb_loop_sec, 1),
        "trim_batched_speedup": round(tb_loop_sec / tb_vec_sec, 2),
        "segments_batched_clips_per_sec": round(
            len(tb_clips) / sg_vec_sec, 1),
        "segments_loop_clips_per_sec": round(
            len(tb_clips) / sg_loop_sec, 1),
        "segments_batched_speedup": round(sg_loop_sec / sg_vec_sec, 2),
        "spectral_batched_clips_per_sec": round(
            len(sp_clips) / sp_vec_sec, 1),
        "spectral_loop_clips_per_sec": round(
            len(sp_clips) / sp_loop_sec, 1),
        "spectral_batched_speedup": round(sp_loop_sec / sp_vec_sec, 2),
        "log_mel_batched_clips_per_sec": round(
            len(sp_clips) / lm_vec_sec, 1),
        "log_mel_loop_clips_per_sec": round(
            len(sp_clips) / lm_loop_sec, 1),
        "log_mel_batched_speedup": round(lm_loop_sec / lm_vec_sec, 2),
        "mfcc_batched_clips_per_sec": round(len(sp_clips) / mc_vec_sec, 1),
        "snr_est_batched_clips_per_sec": round(
            len(sp_clips) / se_vec_sec, 1),
        "snr_est_loop_clips_per_sec": round(
            len(sp_clips) / se_loop_sec, 1),
        "snr_est_batched_speedup": round(se_loop_sec / se_vec_sec, 2),
        "rolloff_batched_clips_per_sec": round(
            len(sp_clips) / ro_vec_sec, 1),
        "remove_dc_batched_clips_per_sec": round(len(sp_clips) / dcv_sec, 1),
        "remove_dc_loop_clips_per_sec": round(len(sp_clips) / dcl_sec, 1),
        "remove_dc_batched_speedup": round(dcl_sec / dcv_sec, 2),
        "mix_noise_batched_clips_per_sec": round(
            len(sp_clips) / nm_vec_sec, 1),
        "mix_noise_loop_clips_per_sec": round(
            len(sp_clips) / nm_loop_sec, 1),
        "mix_noise_batched_speedup": round(nm_loop_sec / nm_vec_sec, 2),
        "pitch_clips_per_sec": round(len(sp_clips) / pt_vec_sec, 1),
        "pitch_batched_speedup": round(pt_loop_sec / pt_vec_sec, 2),
        "reverb_clips_per_sec": round(len(sp_clips) / rv_vec_sec, 1),
        "reverb_batched_speedup": round(rv_loop_sec / rv_vec_sec, 2),
        "codec_family_clips_per_sec": round(len(cf_datas) / cf_vec_sec, 1),
        "codec_family_batched_speedup": round(cf_loop_sec / cf_vec_sec, 2),
        "declip_batched_clips_per_sec": round(len(sp_clips) / dlp_vec_sec, 1),
        "declip_loop_clips_per_sec": round(len(sp_clips) / dlp_loop_sec, 1),
        "declip_batched_speedup": round(dlp_loop_sec / dlp_vec_sec, 2),
        "downmix_batched_clips_per_sec": round(len(sp_clips) / dmx_vec_sec, 1),
        "downmix_loop_clips_per_sec": round(len(sp_clips) / dmx_loop_sec, 1),
        "downmix_batched_speedup": round(dmx_loop_sec / dmx_vec_sec, 2),
        "channel_blocks_batched_clips_per_sec": round(
            len(sp_clips) / chb_vec_sec, 1),
        "channel_blocks_loop_clips_per_sec": round(
            len(sp_clips) / chb_loop_sec, 1),
        "channel_blocks_batched_speedup": round(chb_loop_sec / chb_vec_sec, 2),
        "denoise_batched_clips_per_sec": round(len(sp_clips) / dns_vec_sec, 1),
        "denoise_loop_clips_per_sec": round(len(sp_clips) / dns_loop_sec, 1),
        "denoise_batched_speedup": round(dns_loop_sec / dns_vec_sec, 2),
        "adpcm_decode_clips_per_sec": round(len(sp_clips) / ad_c_sec, 1),
        "adpcm_scan_fallback_clips_per_sec": round(
            len(sp_clips) / ad_scan_sec, 1),
        "adpcm_dispatch_speedup_vs_fallback": round(
            ad_scan_sec / ad_c_sec, 2),
        "adpcm_c_arm_available": adpcm_c_available,
        "iterations": ITERATIONS,
        "protocol": (
            "symmetric best-of-iterations, per-comparison calm gating: "
            "both arms of a comparison run back-to-back inside one "
            "probed window (<= %.2f s gate), each comparison retried "
            "until its window is calm" % CALM_GATE_SEC
        ),
        "host_probe_before_sec": round(host_probe_before, 3),
        "host_probe_after_sec": round(host_probe_after, 3),
        "arm_probes": ARM_PROBES,
        "worst_arm_probe_sec": round(worst_arm_probe, 3),
        # self-describing validity: per BENCH/BASELINE.md, a probe in the
        # seconds is measuring the neighbor VM, not the engine — degraded
        # iff ANY comparison's own window never came in under the gate
        "host_degraded": bool(worst_arm_probe > 0.5),
        "note": (
            "reference gates measured with a real MITIE NER model; this "
            "kernel runs regex-only (NER entities are injected upstream), "
            "so per-message latency is not directly comparable — reported "
            "for the regression-tracking purpose the reference uses it for"
        ),
    }))


if __name__ == "__main__":
    main()
