"""Frequency-domain audio quality features — batched FFT, zero per-clip loops.

Time-domain gates (RMS / ZCR / silence / clipping, ``kernel.audio``) cannot
separate speech-like audio from wideband noise or a tonal hum: a noise burst
and an utterance can share RMS and duration exactly.  The two classic cheap
discriminators are

- **spectral flatness** (Wiener entropy): geometric / arithmetic mean of the
  power spectrum.  ~1.0 for white noise, ~0 for tonal content; speech sits
  well below broadband noise.  The standard "is this channel just noise?"
  feature (ITU-T P.56 era onward).
- **spectral centroid**: power-weighted mean frequency.  A mains hum or DC
  rumble reads as a very low centroid; band-limited chirps/tones read at
  their frequency.

Both are per-frame statistics over Hann-windowed STFT frames, pooled per
clip.  The batched kernel gathers ALL frames of ALL clips in an Arrow batch
into one (n_frames, frame_len) matrix and runs ONE ``np.fft.rfft`` per
memory-bounded block — the same concat + ``reduceat`` shape as
``kernel.audio.segmented_features``, so a 20k-clip batch costs a handful of
numpy calls, not 20k Python iterations.

Reference parity note: thoughtbot/top_secret has no audio surface at all
(it is a text-scrubbing gem); this module is part of the driver-mandated
audio quality-filter tier (north rule: heuristic keep/drop over clip +
transcript rows).
"""

from __future__ import annotations

import numpy as np

from .audio import _clip_blocks, _concat_aranges

# Floor added inside log/ratio so an all-zero (silent) frame is defined,
# not NaN: its flatness evaluates to exactly 1.0 — "indistinguishable from
# noise" — which is the conservative answer for a gate (the silence rule
# fires on such clips before any spectral rule is consulted anyway).
SPECTRAL_EPS = 1e-20

# Frames per FFT block: bounds peak working memory regardless of Arrow
# batch size.  Honest accounting at frame=512 / block=32768: the frame
# gather (rows of a zero-copy sliding-window VIEW, so no index matrix is
# ever materialized) is 64 MiB float32, the windowed copy reuses it in
# place, rfft output is 32768 x 257 complex64 = 64 MiB, and the float64
# power matrix is 128 MiB — ~0.25 GiB peak per concurrent task, ~4x the
# gather alone.  Scale knob, not a semantics knob: each frame is
# independent, so blocking changes results only at float rounding level
# (pocketfft vectorizes ACROSS transforms — same-frame output is
# tight-float reproducible, not bit-identical, under different batch
# shapes; the gate thresholds carry orders-of-magnitude margin).
SPECTRAL_BLOCK_FRAMES = 32768


def spectral_features(
    pcm: np.ndarray, sr_hz: int, frame_ms: int = 32, hop_ms: int = 16
) -> tuple[float, float, int]:
    """Scalar reference twin of ``batch_spectral`` for ONE clip.

    Returns (centroid_hz, flatness, n_frames); a clip shorter than one
    frame (or an empty clip) returns (0.0, 1.0, 0).
    """
    c, f, k = batch_spectral(
        np.asarray(pcm),
        np.array([len(pcm)], dtype=np.int64),
        sr_hz,
        frame_ms=frame_ms,
        hop_ms=hop_ms,
    )
    return float(c[0]), float(f[0]), int(k[0])


def batch_spectral(
    samples: np.ndarray,
    lengths: np.ndarray,
    sr_hz: int,
    frame_ms: int = 32,
    hop_ms: int = 16,
    block_frames: int = SPECTRAL_BLOCK_FRAMES,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-clip (centroid_hz, flatness, n_frames) over a concatenated
    same-sample-rate buffer.

    ``samples`` is the concatenation of every clip's decoded PCM (as
    produced by ``batch_decode``); ``lengths[i]`` is clip i's sample
    count.  All clips share ``sr_hz`` — the caller groups per
    (codec, sr_hz), mirroring the per-codec grouping in
    ``operators.audio.with_audio_features`` (frame length is an
    sr-derived constant, so mixing rates in one call is a type error).

    Pooling: centroid is energy-weighted across ALL of a clip's frames
    (sum of per-frame numerators / sum of denominators — equivalent to
    one centroid over the clip's pooled spectrum), flatness is the
    unweighted mean of per-frame flatness (the conventional clip-level
    Wiener entropy).  Clips with zero frames get (0.0, 1.0, 0).
    """
    n = len(lengths)
    lengths = np.asarray(lengths, dtype=np.int64)
    centroid = np.zeros(n, dtype=np.float64)
    flatness = np.ones(n, dtype=np.float64)
    if sr_hz <= 0 or n == 0:
        return centroid, flatness, np.zeros(n, dtype=np.int64)
    frame = max(2, int(sr_hz * frame_ms / 1000))
    hop = max(1, int(sr_hz * hop_ms / 1000))
    n_frames = np.where(lengths >= frame, 1 + (lengths - frame) // hop, 0)
    total = int(n_frames.sum())
    if total == 0:
        return centroid, flatness, n_frames
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    # absolute start sample of every frame, all clips at once
    clip_of = np.repeat(np.arange(n, dtype=np.int64), n_frames)
    starts = offsets[clip_of] + hop * _concat_aranges(n_frames)
    # periodic Hann (DSP convention for STFT analysis)
    window = (
        0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    ).astype(np.float32)
    freqs = np.fft.rfftfreq(frame, 1.0 / sr_hz)
    # zero-copy view of every length-`frame` window in the buffer; row
    # gathers below copy only the frames they select — no (block x
    # frame) int64 index matrix is ever materialized.  Safe: total > 0
    # implies some clip has >= frame samples, so len(samples) >= frame.
    windows_view = np.lib.stride_tricks.sliding_window_view(samples, frame)
    fr_num = np.empty(total, dtype=np.float64)
    fr_den = np.empty(total, dtype=np.float64)
    fr_flat = np.empty(total, dtype=np.float64)
    for lo in range(0, total, max(1, block_frames)):
        hi = min(lo + max(1, block_frames), total)
        frames = windows_view[starts[lo:hi]].astype(np.float32)
        frames *= window
        # rfft on float32 -> complex64; accumulate statistics in float64
        power = np.abs(np.fft.rfft(frames, axis=1)).astype(np.float64) ** 2
        fr_num[lo:hi] = power @ freqs
        fr_den[lo:hi] = power.sum(axis=1)
        # flatness is mathematically <= 1 (AM-GM); clamp the eps
        # arithmetic so a silent frame reads exactly 1.0
        fr_flat[lo:hi] = np.minimum(
            np.exp(np.mean(np.log(power + SPECTRAL_EPS), axis=1))
            / (power.mean(axis=1) + SPECTRAL_EPS),
            1.0,
        )
    has = n_frames > 0
    fstarts = (np.cumsum(n_frames) - n_frames)[has]
    num = np.add.reduceat(fr_num, fstarts)
    den = np.add.reduceat(fr_den, fstarts)
    np.divide(num, den, out=num, where=den > 0)
    centroid[has] = np.where(den > 0, num, 0.0)
    flatness[has] = np.add.reduceat(fr_flat, fstarts) / n_frames[has]
    return centroid, flatness, n_frames


# --- log-mel filterbank features (the ASR training input) ---------------------

# HTK mel scale: mel(f) = 2595 log10(1 + f/700) — the convention every
# mainstream feature front-end (Kaldi/HTK-style fbank, librosa htk=True)
# documents; deterministic closed form, no tables.
def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    sr_hz: int, frame: int, n_mels: int
) -> tuple[np.ndarray, np.ndarray]:
    """Triangular mel filterbank → (weights [n_mels, frame//2+1],
    center_hz [n_mels]).  n_mels+2 mel-equidistant edge points between
    0 Hz and Nyquist; filter i rises over (edge[i], edge[i+1]) and
    falls over (edge[i+1], edge[i+2]).  Pure function of
    (sr_hz, frame, n_mels) — identical on every worker and every run."""
    if n_mels < 1:
        raise ValueError(f"n_mels must be >= 1, got {n_mels}")
    n_bins = frame // 2 + 1
    edges_hz = mel_to_hz(
        np.linspace(0.0, hz_to_mel(sr_hz / 2.0), n_mels + 2)
    )
    freqs = np.fft.rfftfreq(frame, 1.0 / sr_hz)
    lo = edges_hz[:-2, None]
    mid = edges_hz[1:-1, None]
    hi = edges_hz[2:, None]
    up = (freqs[None, :] - lo) / np.maximum(mid - lo, 1e-12)
    down = (hi - freqs[None, :]) / np.maximum(hi - mid, 1e-12)
    fb = np.clip(np.minimum(up, down), 0.0, None)
    assert fb.shape == (n_mels, n_bins)
    return fb.astype(np.float64), edges_hz[1:-1].copy()


# Log-mel blocks are much smaller than the spectral gate's: the mel
# matmul re-reads the whole block's power matrix, so keeping the block
# L2/L3-resident wins — measured ~1.8x faster at 2048 frames than at
# 32768 on this host (the gate's scalar reductions don't re-read, so
# its larger block stands).
LOG_MEL_BLOCK_FRAMES = 2048


def batch_log_mel(
    samples: np.ndarray,
    lengths: np.ndarray,
    sr_hz: int,
    n_mels: int = 40,
    frame_ms: int = 32,
    hop_ms: int = 16,
    block_frames: int = LOG_MEL_BLOCK_FRAMES,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-frame log-mel energies over a concatenated same-rate buffer →
    (mel [total_frames, n_mels] float32, n_frames [n_clips]).

    Same concat + blocked-FFT shape as ``batch_spectral`` (one
    ``np.fft.rfft`` per memory-bounded block, zero per-clip Python);
    the mel projection is one (block × bins) @ (bins × n_mels) matmul
    per block.  log is natural-log of (energy + eps) — silent frames
    read the floor, never NaN.  Clip i's frames are rows
    [cumsum(n_frames)[i-1] : cumsum(n_frames)[i]] in input order."""
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(lengths)
    if sr_hz <= 0 or n == 0:
        return (np.zeros((0, n_mels), dtype=np.float32),
                np.zeros(n, dtype=np.int64))
    frame = max(2, int(sr_hz * frame_ms / 1000))
    hop = max(1, int(sr_hz * hop_ms / 1000))
    n_frames = np.where(lengths >= frame, 1 + (lengths - frame) // hop, 0)
    total = int(n_frames.sum())
    if total == 0:
        return (np.zeros((0, n_mels), dtype=np.float32), n_frames)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    clip_of = np.repeat(np.arange(n, dtype=np.int64), n_frames)
    starts = offsets[clip_of] + hop * _concat_aranges(n_frames)
    window = (
        0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    ).astype(np.float32)
    fb_t = mel_filterbank(sr_hz, frame, n_mels)[0].T  # (bins, n_mels)
    windows_view = np.lib.stride_tricks.sliding_window_view(samples, frame)
    out = np.empty((total, n_mels), dtype=np.float32)
    for lo in range(0, total, max(1, block_frames)):
        hi = min(lo + max(1, block_frames), total)
        frames = windows_view[starts[lo:hi]].astype(np.float32)
        frames *= window
        power = np.abs(np.fft.rfft(frames, axis=1)).astype(np.float64) ** 2
        out[lo:hi] = np.log(power @ fb_t + SPECTRAL_EPS).astype(np.float32)
    return out, n_frames


def log_mel_features(
    pcm: np.ndarray,
    sr_hz: int,
    n_mels: int = 40,
    frame_ms: int = 32,
    hop_ms: int = 16,
) -> np.ndarray:
    """Scalar reference twin of ``batch_log_mel`` for ONE clip —
    per-frame loop, used by property tests to pin the batched kernel."""
    frame = max(2, int(sr_hz * frame_ms / 1000))
    hop = max(1, int(sr_hz * hop_ms / 1000))
    if sr_hz <= 0 or len(pcm) < frame:
        return np.zeros((0, n_mels), dtype=np.float32)
    window = (
        0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    ).astype(np.float32)
    fb_t = mel_filterbank(sr_hz, frame, n_mels)[0].T
    rows = []
    for s in range(0, len(pcm) - frame + 1, hop):
        fr = pcm[s:s + frame].astype(np.float32) * window
        power = np.abs(np.fft.rfft(fr)).astype(np.float64) ** 2
        rows.append(np.log(power @ fb_t + SPECTRAL_EPS).astype(np.float32))
    return np.stack(rows)


def dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n_out × n_in) — the log-mel → cepstrum
    projection (HTK/Kaldi convention).  Pure function of its shape:
    identical on every worker, no tables, no scipy."""
    if n_out < 1 or n_out > n_in:
        raise ValueError(
            f"need 1 <= n_out <= n_in, got n_out={n_out}, n_in={n_in}")
    m = np.arange(n_in, dtype=np.float64)
    k = np.arange(n_out, dtype=np.float64)[:, None]
    d = np.cos(np.pi * k * (2.0 * m + 1.0) / (2.0 * n_in))
    d *= np.sqrt(2.0 / n_in)
    d[0] *= np.sqrt(0.5)  # orthonormal c0 scaling
    return d


def batch_mfcc(
    samples: np.ndarray,
    lengths: np.ndarray,
    sr_hz: int,
    n_mfcc: int = 13,
    n_mels: int = 40,
    frame_ms: int = 32,
    hop_ms: int = 16,
    block_frames: int = LOG_MEL_BLOCK_FRAMES,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-frame MFCCs over a concatenated same-rate buffer →
    (mfcc [total_frames, n_mfcc] float32, n_frames [n_clips]): ONE
    extra (frames × n_mels) @ (n_mels × n_mfcc) matmul on top of
    ``batch_log_mel`` — same blocked-FFT batching, zero per-clip
    Python.  Frame layout identical to ``batch_log_mel``."""
    mel, n_frames = batch_log_mel(
        samples, lengths, sr_hz, n_mels=n_mels,
        frame_ms=frame_ms, hop_ms=hop_ms, block_frames=block_frames,
    )
    d_t = dct_matrix(n_mels, n_mfcc).T.astype(np.float32)
    return (mel @ d_t).astype(np.float32), n_frames


def mfcc_features(
    pcm: np.ndarray,
    sr_hz: int,
    n_mfcc: int = 13,
    n_mels: int = 40,
    frame_ms: int = 32,
    hop_ms: int = 16,
) -> np.ndarray:
    """Scalar reference twin of ``batch_mfcc`` for ONE clip (property
    tests pin the batched kernel to this)."""
    mel = log_mel_features(pcm, sr_hz, n_mels=n_mels,
                           frame_ms=frame_ms, hop_ms=hop_ms)
    d_t = dct_matrix(n_mels, n_mfcc).T.astype(np.float32)
    if not len(mel):
        return np.zeros((0, n_mfcc), dtype=np.float32)
    return (mel @ d_t).astype(np.float32)


def rolloff_features(
    pcm: np.ndarray,
    sr_hz: int,
    q: float = 0.95,
    frame_ms: int = 32,
    hop_ms: int = 16,
) -> tuple[float, int]:
    """Scalar twin of ``batch_rolloff`` for ONE clip → (rolloff_hz,
    n_frames): the frequency below which fraction ``q`` of the clip's
    POOLED spectral energy lies — the effective-bandwidth probe.
    Genuine wideband speech rolls off near Nyquist; audio UPSAMPLED
    from a lower rate has (almost) no energy above the source Nyquist,
    so a 16 kHz clip whose rolloff sits under ~4.2 kHz was born 8 kHz
    no matter what its metadata claims."""
    frame = max(2, int(sr_hz * frame_ms / 1000))
    hop = max(1, int(sr_hz * hop_ms / 1000))
    if sr_hz <= 0 or len(pcm) < frame:
        return 0.0, 0
    window = (
        0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    ).astype(np.float32)
    freqs = np.fft.rfftfreq(frame, 1.0 / sr_hz)
    pooled = np.zeros(len(freqs), dtype=np.float64)
    nf = 0
    for s in range(0, len(pcm) - frame + 1, hop):
        fr = pcm[s:s + frame].astype(np.float32) * window
        pooled += np.abs(np.fft.rfft(fr)).astype(np.float64) ** 2
        nf += 1
    tot = pooled.sum()
    if tot <= 0:
        return 0.0, nf
    k = int(np.searchsorted(np.cumsum(pooled), q * tot))
    return float(freqs[min(k, len(freqs) - 1)]), nf


def batch_rolloff(
    samples: np.ndarray,
    lengths: np.ndarray,
    sr_hz: int,
    q: float = 0.95,
    frame_ms: int = 32,
    hop_ms: int = 16,
    block_frames: int = SPECTRAL_BLOCK_FRAMES,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-clip spectral rolloff over a concatenated same-rate buffer →
    (rolloff_hz [n], n_frames [n]); definition in ``rolloff_features``.

    Same blocked-FFT shape as ``batch_spectral``; the per-clip pooled
    spectrum accumulates INSIDE the block loop (one ``np.add.reduceat``
    per block over that block's frame-power rows, added into an
    (n_clips × n_bins) buffer), and the q-quantile bin is one
    vectorized cumsum + argmax per clip — no per-clip Python.  Peak
    working memory is the block's power matrix plus the pooled buffer,
    NOT a (total_frames × n_bins) matrix: a 10k-row Arrow batch of
    600 ms 16 kHz clips would otherwise hold ~740 MB of frame powers
    per task, defeating the blocked-FFT bound the sibling kernels keep."""
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(lengths)
    roll = np.zeros(n, dtype=np.float64)
    if sr_hz <= 0 or n == 0:
        return roll, np.zeros(n, dtype=np.int64)
    frame = max(2, int(sr_hz * frame_ms / 1000))
    hop = max(1, int(sr_hz * hop_ms / 1000))
    n_frames = np.where(lengths >= frame, 1 + (lengths - frame) // hop, 0)
    total = int(n_frames.sum())
    if total == 0:
        return roll, n_frames
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    clip_of = np.repeat(np.arange(n, dtype=np.int64), n_frames)
    starts = offsets[clip_of] + hop * _concat_aranges(n_frames)
    window = (
        0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    ).astype(np.float32)
    freqs = np.fft.rfftfreq(frame, 1.0 / sr_hz)
    windows_view = np.lib.stride_tricks.sliding_window_view(samples, frame)
    n_bins = len(freqs)
    pooled = np.zeros((n, n_bins), dtype=np.float64)
    for lo in range(0, total, max(1, block_frames)):
        hi = min(lo + max(1, block_frames), total)
        frames = windows_view[starts[lo:hi]].astype(np.float32)
        frames *= window
        power = (np.abs(np.fft.rfft(frames, axis=1)) ** 2).astype(np.float64)
        # frames are emitted in clip order, so each block's rows group
        # into contiguous clip runs: one reduceat per block, added into
        # the per-clip pooled buffer (a clip straddling blocks gets its
        # partial sums added — float64 addition is associative enough
        # for a q-quantile bin with orders-of-magnitude margins)
        cb = clip_of[lo:hi]
        bnd = np.flatnonzero(np.r_[True, cb[1:] != cb[:-1]])
        pooled[cb[bnd]] += np.add.reduceat(power, bnd, axis=0)
    csum = np.cumsum(pooled, axis=1)
    tot = csum[:, -1]
    ok = tot > 0
    # first bin where cumulative energy reaches q*total (vectorized
    # searchsorted via argmax on the boolean crossing)
    kidx = np.argmax(csum >= (q * tot)[:, None], axis=1)
    roll[ok] = freqs[kidx[ok]]
    return roll, n_frames


# --- spectral-subtraction denoise (restoration counterpart of noise mixing) ---

# Sized to the INTERMEDIATES, not the input (the batch_pitch lesson):
# pass 2 keeps ~10 per-frame temporaries alive (frames, spec, mag,
# target, gain, y, pos, plus the FFT workspace) — at 1024 frames x 512
# samples each is ~2-4 MiB, so the whole set stays L3-resident; the
# previous 8192-frame blocks streamed ~150 MiB of float64 per block
# through DRAM and the batched arm measured a TIE against the per-clip
# loop it exists to beat.
DENOISE_BLOCK_FRAMES = 1024

# Chunk bound for the total-sized temporaries (see the chunking note in
# batch_denoise): 4 M samples keeps each ~32 MiB, ~160 MiB working set
# per task at any Arrow batch size.
DENOISE_CHUNK_SAMPLES = 1 << 22


def batch_denoise(
    samples: np.ndarray,
    lengths: np.ndarray,
    sr_hz: int,
    frame_ms: int = 32,
    alpha: float = 2.0,
    beta: float = 0.05,
    quiet_frac: float = 0.2,
    block_frames: int = DENOISE_BLOCK_FRAMES,
) -> tuple[np.ndarray, np.ndarray]:
    """Spectral-subtraction noise reduction over a concatenated
    same-rate buffer (Boll 1979, the classic stationary-noise
    restoration): estimate each clip's noise magnitude spectrum from
    its QUIETEST ``quiet_frac`` of frames (by unwindowed time-domain
    energy — one global cumsum, no FFT spent on selection), subtract
    ``alpha`` times it from every frame's magnitude with a ``beta``
    spectral floor (phase untouched), and resynthesize by
    windowed overlap-add.

    Interior samples reconstruct EXACTLY when unmodified (num =
    sum x*w^2, den = sum w^2 — no COLA assumption needed).  Samples
    with near-zero window coverage — the first/last half-frame of each
    clip, any tail no frame covers, whole clips shorter than
    ``frame`` — PASS THROUGH unchanged rather than divide by a
    vanishing den (the classic OLA edge blow-up); interior coverage
    for 50%-overlap Hann^2 is bounded in [0.5, 1], so the division is
    always well-conditioned where it is applied.  ``alpha = 2``
    over-subtracts (standard practice: the noise-magnitude MEAN
    underestimates Rayleigh-fluctuating bin magnitudes).

    Fully batched: per-clip quiet-frame selection is one lexsort +
    rank compare across ALL clips; both FFT passes (noise estimate
    over quiet frames only — ~``quiet_frac`` of the corpus — then the
    full subtract/resynthesize pass) run in memory-bounded blocks.
    Returns ``(denoised, n_frames)``."""
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(lengths)
    # Clip-aligned CHUNKING, not a per-clip regime: the noise estimate
    # and OLA are per-clip independent, so splitting the batch into
    # groups of clips is a pure layout change, and it bounds the five
    # total-sized float64 temporaries (out/x64/csum2/num/den, ~40 B per
    # sample) at ~DENOISE_CHUNK_SAMPLES each without giving up the
    # batched FFT.  The previous mean-length per-clip split made the
    # "batched" path a per-clip loop at realistic 0.2-0.3 s clip
    # lengths and it measured ~0.6x the plain loop (recursion setup per
    # clip); chunked full-batch measures ~1.3x ON THE SAME INPUT.  An
    # oversize clip gets its own chunk (same work as per-clip).
    if n > 1 and int(lengths.sum()) > DENOISE_CHUNK_SAMPLES:
        out = np.empty(int(lengths.sum()), dtype=np.float32)
        nfs = np.zeros(n, dtype=np.int64)
        for start, stop, lo, hi in _clip_blocks(
            lengths, DENOISE_CHUNK_SAMPLES
        ):
            o1, nf1 = batch_denoise(
                samples[lo:hi], lengths[start:stop], sr_hz,
                frame_ms=frame_ms, alpha=alpha, beta=beta,
                quiet_frac=quiet_frac, block_frames=block_frames,
            )
            out[lo:hi] = o1
            nfs[start:stop] = nf1
        return out, nfs
    out = samples.astype(np.float64, copy=True)
    frame = max(4, int(sr_hz * frame_ms / 1000)) & ~1
    hop = frame // 2
    n_frames = np.where(lengths >= frame, 1 + (lengths - frame) // hop, 0)
    total = int(n_frames.sum())
    if total == 0 or sr_hz <= 0:
        return out.astype(np.float32), n_frames
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    clip_of = np.repeat(np.arange(n, dtype=np.int64), n_frames)
    starts = offsets[clip_of] + hop * _concat_aranges(n_frames)
    window = (
        0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    ).astype(np.float64)
    n_bins = frame // 2 + 1

    # ---- pass 0: frame energies from one global cumsum (no FFT)
    x64 = samples.astype(np.float64)
    csum2 = np.concatenate([[0.0], np.cumsum(x64 * x64)])
    energy = csum2[starts + frame] - csum2[starts]

    # ---- per-clip quietest-frame selection (one lexsort, all clips)
    order = np.lexsort((energy, clip_of))
    rank = _concat_aranges(n_frames)
    n_quiet = np.maximum(1, np.ceil(quiet_frac * n_frames).astype(np.int64))
    quiet = np.zeros(total, dtype=bool)
    quiet[order[rank < np.repeat(n_quiet, n_frames)]] = True

    windows_view = np.lib.stride_tricks.sliding_window_view(samples, frame)

    # ---- pass 1: noise magnitude spectrum from quiet frames only
    noise = np.zeros((n, n_bins), dtype=np.float64)
    qidx = np.flatnonzero(quiet)
    for lo in range(0, len(qidx), max(1, block_frames)):
        sel = qidx[lo:lo + max(1, block_frames)]
        frames = windows_view[starts[sel]].astype(np.float64) * window
        mag = np.abs(np.fft.rfft(frames, axis=1))
        np.add.at(noise, clip_of[sel], mag)
    noise /= n_quiet[:, None]

    # ---- pass 2: subtract + overlap-add resynthesis
    num = np.zeros(len(samples), dtype=np.float64)
    den = np.zeros(len(samples), dtype=np.float64)
    pos_base = np.arange(frame, dtype=np.int64)
    # At 50 % overlap (frame == 2*hop exactly) a sample is covered by AT
    # MOST two frames — consecutive local indices, hence opposite
    # parity — so frames of one parity never collide and the OLA can use
    # unique-index fancy `+=` instead of np.add.at (whose duplicate-safe
    # scatter loop cost rivals the FFT itself here).  Bit-identical:
    # each sample receives the same <= 2 addends, and two-term float
    # addition is commutative.
    parity = _concat_aranges(n_frames) & 1
    w2 = window * window
    for lo in range(0, total, max(1, block_frames)):
        hi = min(lo + max(1, block_frames), total)
        frames = windows_view[starts[lo:hi]].astype(np.float64) * window
        spec = np.fft.rfft(frames, axis=1)
        mag = np.abs(spec)
        target = np.maximum(
            mag - alpha * noise[clip_of[lo:hi]], beta * mag
        )
        with np.errstate(invalid="ignore", divide="ignore"):
            gain = np.where(mag > 0, target / mag, 0.0)
        y = np.fft.irfft(spec * gain, n=frame, axis=1) * window
        par = parity[lo:hi]
        for p in (0, 1):
            rows = np.flatnonzero(par == p)
            if len(rows):
                pos = (
                    starts[lo + rows, None] + pos_base[None, :]
                ).ravel()
                num[pos] += y[rows].ravel()
                den[pos] += np.tile(w2, len(rows))
    covered = den > 0.1  # hann^2 interior coverage is >= 0.5
    out[covered] = num[covered] / den[covered]
    return out.astype(np.float32), n_frames


# --- autocorrelation pitch (f0) estimation -------------------------------------

# 1024 frames/block keeps the irfft intermediate (block x nfft
# float64 — np.fft promotes internally — ~8 MB at nfft 1024) L3-resident — at 8192 frames the 100+ MB
# autocorrelation matrix goes through DRAM and the batched path loses
# to a per-clip loop whose intermediates never leave L2 (measured
# 0.70x before this sizing; the same crossover the r3 segmented
# kernels hit).
PITCH_BLOCK_FRAMES = 1024


def batch_pitch(
    samples: np.ndarray,
    lengths: np.ndarray,
    sr_hz: int,
    frame_ms: int = 32,
    hop_ms: int = 16,
    f_min: float = 60.0,
    f_max: float = 400.0,
    voiced_threshold: float = 0.5,
    block_frames: int = PITCH_BLOCK_FRAMES,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-clip (f0_hz, voiced_ratio, n_frames) by normalized
    autocorrelation over a concatenated same-sample-rate buffer — the
    dominant fundamental a speaker-diversity / music-vs-speech
    curation stat ranks by.  Scope: a DOMINANT-f0 estimator (one value
    per clip from the pooled autocorrelation), not a pitch tracker.

    Method, per frame (DC removed, rectangular window): linear
    autocorrelation via one zero-padded rFFT/irFFT round trip;
    unbiased normalization r[t] / (r[0] * (N-t)/N) so a periodic
    signal reads ~1.0 at every period multiple instead of decaying
    with lag.  Frames pool into ONE per-clip autocorrelation (sums of
    r[t] and r[0] — reduceat per block into an (n_clips, n_lags)
    buffer, so peak memory is block-bounded like batch_log_mel, never
    (total_frames x n_lags) like the batch_rolloff bug this round
    fixed).  Clip f0 = the SMALLEST lag whose pooled normalized
    autocorrelation reaches 0.9 x the pooled peak (period multiples
    tie at ~1.0 under unbiased normalization; smallest-first resolves
    the subharmonic ambiguity deterministically), voiced iff the
    pooled peak >= voiced_threshold.  voiced_ratio = fraction of
    frames whose OWN normalized peak clears the threshold.

    Unvoiced / silent / sub-frame clips read f0 = 0.0.  The lag grid
    quantizes f0 to sr/lag values (no interpolation) — callers gate
    with relative bands, not equality.
    """
    n = len(lengths)
    lengths = np.asarray(lengths, dtype=np.int64)
    f0 = np.zeros(n, dtype=np.float64)
    vratio = np.zeros(n, dtype=np.float64)
    if sr_hz <= 0 or n == 0:
        return f0, vratio, np.zeros(n, dtype=np.int64)
    frame = max(2, int(sr_hz * frame_ms / 1000))
    hop = max(1, int(sr_hz * hop_ms / 1000))
    lag_min = max(1, int(np.floor(sr_hz / f_max)))
    lag_max = min(frame - 1, int(np.ceil(sr_hz / f_min)))
    if lag_max <= lag_min:
        raise ValueError(
            f"pitch lag window empty: frame={frame} samples, "
            f"lags [{lag_min}, {lag_max}] — raise frame_ms or f_min"
        )
    n_frames = np.where(lengths >= frame, 1 + (lengths - frame) // hop, 0)
    total = int(n_frames.sum())
    if total == 0:
        return f0, vratio, n_frames
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    clip_of = np.repeat(np.arange(n, dtype=np.int64), n_frames)
    starts = offsets[clip_of] + hop * _concat_aranges(n_frames)
    windows_view = np.lib.stride_tricks.sliding_window_view(samples, frame)
    nfft = 1
    while nfft < frame + lag_max + 1:
        nfft <<= 1
    lags = np.arange(lag_min, lag_max + 1, dtype=np.float64)
    # unbiased correction per lag: N / (N - t)
    unbias = frame / (frame - lags)
    acc_r = np.zeros((n, lag_max + 1 - lag_min), dtype=np.float64)
    acc_r0 = np.zeros(n, dtype=np.float64)
    voiced_frames = np.zeros(n, dtype=np.int64)
    for lo in range(0, total, max(1, block_frames)):
        hi = min(lo + max(1, block_frames), total)
        # float32 gather/demean halves the frame-copy traffic;
        # np.fft then promotes to float64/complex128 internally, so
        # the irfft intermediate is full double precision — which is
        # why PITCH_BLOCK_FRAMES is sized small enough that EVEN the
        # float64 intermediate stays cache-resident (the block size,
        # not the dtype, is what decides batch-vs-loop here).
        frames = windows_view[starts[lo:hi]].astype(np.float32)
        frames -= frames.mean(axis=1, keepdims=True)
        spec = np.fft.rfft(frames, nfft, axis=1)
        r = np.fft.irfft(spec.real**2 + spec.imag**2, nfft, axis=1)
        r0 = r[:, 0]
        rwin = r[:, lag_min:lag_max + 1]
        # per-frame voiced flag from the frame's own unbiased peak
        safe = r0 > 0
        peak_f = np.zeros(hi - lo, dtype=np.float64)
        peak_f[safe] = (rwin[safe] * unbias).max(axis=1) / r0[safe]
        fvoiced = (peak_f >= voiced_threshold).astype(np.int64)
        # pool into per-clip accumulators: frames arrive ordered by
        # clip, so one reduceat per block + indexed add
        blk_clips = clip_of[lo:hi]
        bstarts = np.flatnonzero(np.diff(blk_clips, prepend=blk_clips[0] - 1))
        rows = blk_clips[bstarts]
        acc_r[rows] += np.add.reduceat(rwin, bstarts, axis=0)
        acc_r0[rows] += np.add.reduceat(r0, bstarts)
        voiced_frames[rows] += np.add.reduceat(fvoiced, bstarts)
    has = n_frames > 0
    vratio[has] = voiced_frames[has] / n_frames[has]
    ok = has & (acc_r0 > 0)
    if ok.any():
        rn = acc_r[ok] * unbias / acc_r0[ok, None]
        peak = rn.max(axis=1)
        # smallest LOCAL MAXIMUM within 0.9 x peak — period multiples
        # tie near 1.0 under unbiased normalization so smallest-first
        # resolves the subharmonic; requiring a local max keeps the
        # pick off the first peak's rising shoulder (a plain >= 0.9
        # threshold lands several lags early and biases f0 high)
        left = np.empty_like(rn)
        left[:, 0] = -np.inf
        left[:, 1:] = rn[:, :-1]
        right = np.empty_like(rn)
        right[:, -1] = -np.inf
        right[:, :-1] = rn[:, 1:]
        is_peak = (rn >= left) & (rn >= right) & (rn >= 0.9 * peak[:, None])
        first = np.argmax(is_peak, axis=1)
        cand = sr_hz / (lag_min + first)
        f0[ok] = np.where(peak >= voiced_threshold, cand, 0.0)
    return f0, vratio, n_frames


def pitch_features(
    pcm: np.ndarray, sr_hz: int, **kw
) -> tuple[float, float, int]:
    """Scalar reference twin of ``batch_pitch`` for ONE clip."""
    f0, vr, nf = batch_pitch(
        np.asarray(pcm), np.array([len(pcm)], dtype=np.int64), sr_hz, **kw
    )
    return float(f0[0]), float(vr[0]), int(nf[0])


# --- reverberation (RT60 proxy) -------------------------------------------------


def batch_reverb(
    samples: np.ndarray,
    lengths: np.ndarray,
    sr_hz: int,
    frame_ms: int = 20,
    min_run: int = 4,
    min_pairs: int = 6,
    drop_db: float = 0.25,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-clip (rt60_s, n_decay_pairs, n_frames) — a free-decay RT60
    proxy from the energy envelope, the reverberation gate speech
    curation runs before ASR training (a boomy room smears phone
    boundaries; heavily reverberant clips hurt more than they help).

    Method: non-overlapping ``frame_ms`` energy frames (one reduceat
    over the squared buffer — no per-clip Python).  Frame pairs inside
    a monotonic decay run of >= ``min_run`` frames, with both frames
    above the clip's noise floor (1e-6 x its peak frame energy),
    contribute a decay rate -10*log10(E[k+1]/E[k]) / hop_s (dB/s;
    pairs shallower than ``drop_db`` are envelope ripple, not decay).
    The clip's rate is the LOWER MEDIAN of its qualifying pairs
    (robust to the fast direct-sound drop at burst onsets) and
    rt60 = 60 / rate.  Clips with < ``min_pairs`` qualifying pairs —
    steady noise, pure tones, silence — read rt60 = 0.0 with
    n_decay_pairs saying why: unmeasurable is NOT dry, and callers
    gate on the pair count (same not-ok convention as the mel/snr
    estimators).

    For an amplitude tail exp(-t/tau) the energy decays at
    (20 log10 e)/tau ~ 8.686/tau dB/s, so rt60 ~ 6.908*tau (t for a
    60 dB energy drop) — the closed form the planted fixtures gate
    against.  Defaults balance the two failure modes: frames long
    enough (20 ms) that a slow, strongly-reverberant tail still drops
    >= drop_db per pair, drop_db + min_run strict enough that steady
    noise's envelope ripple almost never strings together a
    qualifying run.
    """
    n = len(lengths)
    lengths = np.asarray(lengths, dtype=np.int64)
    rt60 = np.zeros(n, dtype=np.float64)
    npairs = np.zeros(n, dtype=np.int64)
    if sr_hz <= 0 or n == 0:
        return rt60, npairs, np.zeros(n, dtype=np.int64)
    frame = max(1, int(sr_hz * frame_ms / 1000))
    hop_s = frame / sr_hz
    n_frames = lengths // frame
    total = int(n_frames.sum())
    if total == 0:
        return rt60, npairs, n_frames
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    clip_of = np.repeat(np.arange(n, dtype=np.int64), n_frames)
    starts = offsets[clip_of] + frame * _concat_aranges(n_frames)
    sq = np.asarray(samples, dtype=np.float64) ** 2
    # reduceat sums [starts[i], starts[i+1]) — but consecutive frame
    # starts inside a clip are `frame` apart and the LAST frame of each
    # clip would run into the next clip's leftover; sum cumulative and
    # difference instead for exact [start, start+frame) windows
    csum = np.concatenate(([0.0], np.cumsum(sq)))
    energy = (csum[starts + frame] - csum[starts]) / frame
    # clip peak energy -> relative noise floor
    fstarts = np.cumsum(n_frames) - n_frames
    has = n_frames > 0
    peak = np.zeros(n, dtype=np.float64)
    peak[has] = np.maximum.reduceat(energy, fstarts[has])
    floor = peak[clip_of] * 1e-6
    # pair k = (frame k, frame k+1) valid iff same clip
    same = clip_of[:-1] == clip_of[1:]
    e0, e1 = energy[:-1], energy[1:]
    with np.errstate(divide="ignore", invalid="ignore"):
        drop = 10.0 * (np.log10(e0) - np.log10(e1))
    decaying = same & (e0 > floor[:-1]) & (e1 > floor[:-1]) & (drop > drop_db)
    # run lengths of consecutive decaying pairs; keep runs >= min_run
    idx = np.flatnonzero(np.diff(np.concatenate(([0], decaying.view(np.int8), [0]))))
    run_starts, run_ends = idx[::2], idx[1::2]
    keep = (run_ends - run_starts) >= min_run
    inc = np.zeros(len(decaying) + 1, dtype=np.int32)
    np.add.at(inc, run_starts[keep], 1)
    np.add.at(inc, run_ends[keep], -1)
    mask = np.cumsum(inc[:-1]) > 0
    if not mask.any():
        return rt60, npairs, n_frames
    rates = drop[mask] / hop_s
    pclips = clip_of[:-1][mask]
    np.add.at(npairs, pclips, 1)
    # lower median per clip: sort by (clip, rate), pick middle
    order = np.lexsort((rates, pclips))
    sclips = pclips[order]
    srates = rates[order]
    seg = np.flatnonzero(np.diff(sclips, prepend=sclips[0] - 1))
    counts = np.diff(np.concatenate((seg, [len(sclips)])))
    med_idx = seg + (counts - 1) // 2
    med_clip = sclips[seg]
    med_rate = srates[med_idx]
    ok = npairs[med_clip] >= min_pairs
    rt60[med_clip[ok]] = 60.0 / med_rate[ok]
    return rt60, npairs, n_frames


def reverb_features(pcm: np.ndarray, sr_hz: int, **kw) -> tuple[float, int, int]:
    """Scalar reference twin of ``batch_reverb`` for ONE clip."""
    r, p, f = batch_reverb(
        np.asarray(pcm), np.array([len(pcm)], dtype=np.int64), sr_hz, **kw
    )
    return float(r[0]), int(p[0]), int(f[0])
