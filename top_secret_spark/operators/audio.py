"""Audio decode / validate / feature-extract operators.

Decode runs inside ``mapInPandas`` — one vectorized numpy decode per
Arrow batch, never per-row Python.  The pipeline does NOT materialize
raw PCM into the output table (at 10^12 clips that would be a multi-PB
write amplification); it validates decodability and extracts cheap
features instead.  ``decoded_pcm_df`` materializes PCM for tests and the
SNR passthrough gate only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FEATURES_SCHEMA_SUFFIX = (
    "decode_ok boolean, rms double, zcr double, dur_ms_measured int, "
    "silence_ratio double, clipping_ratio double"
)


def with_audio_features(df: DataFrame) -> DataFrame:
    """Append decode_ok / rms / zcr / dur_ms_measured to a clips frame.

    Unknown codecs yield decode_ok=false rather than failing the job —
    at scale a poison row must not kill a 1000-executor stage.

    The ``bytes`` column is consumed here and NOT emitted: re-serializing
    multi-KB audio blobs back across the Arrow boundary (and through
    every downstream stage) would double the pipeline's memory traffic
    for a column nothing downstream reads."""
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema
        if f.name != "bytes"
    )
    schema += ", " + _FEATURES_SCHEMA_SUFFIX

    def run(iterator):
        import numpy as np

        from ..kernel.audio import (
            SUPPORTED_CODECS,
            batch_decode,
            segmented_features,
            segmented_ratios,
        )

        for pdf in iterator:
            n = len(pdf)
            oks = np.zeros(n, dtype=bool)
            rmss = np.zeros(n, dtype=np.float64)
            zcrs = np.zeros(n, dtype=np.float64)
            durs = np.zeros(n, dtype=np.int64)
            # undecodable rows are DEFINED as fully silent: they carry no
            # usable signal, and the gate names decode_error before
            # silence anyway
            sils = np.ones(n, dtype=np.float64)
            clps = np.zeros(n, dtype=np.float64)
            datas = pdf["bytes"].tolist()
            codecs = pdf["codec"].to_numpy()
            srs = pdf["sr_hz"].to_numpy()
            # one concatenated decode + segmented feature pass per codec
            # present in the batch — no per-clip Python loop
            for codec in SUPPORTED_CODECS:
                idx = np.flatnonzero(
                    (codecs == codec)
                    & np.array([d is not None for d in datas])
                )
                if not len(idx):
                    continue
                samples, lengths = batch_decode(
                    [bytes(datas[i]) for i in idx], codec
                )
                r, z, d = segmented_features(
                    samples, lengths, srs[idx].astype(np.float64)
                )
                si, cl = segmented_ratios(samples, lengths)
                oks[idx] = True
                rmss[idx] = r
                zcrs[idx] = z
                durs[idx] = d
                sils[idx] = si
                clps[idx] = cl
            pdf = pdf.drop(columns=["bytes"])
            pdf["decode_ok"] = oks
            pdf["rms"] = rmss
            pdf["zcr"] = zcrs
            pdf["dur_ms_measured"] = durs
            pdf["silence_ratio"] = sils
            pdf["clipping_ratio"] = clps
            yield pdf

    return df.mapInPandas(run, schema=schema)


@dataclass(frozen=True)
class AudioGateThresholds:
    """Keep/drop rules over decoded-audio features — the audio twin of
    ``kernel.quality.QualityThresholds``.  Frozen so the config captured
    at plan time cannot drift under a running job."""

    min_dur_ms: int = 300
    max_silence_ratio: float = 0.98
    max_clipping_ratio: float = 0.2


DEFAULT_AUDIO_GATE = AudioGateThresholds()


def audio_drop_reason_col(
    th: AudioGateThresholds = DEFAULT_AUDIO_GATE,
) -> Column:
    """First-matching-rule drop reason over the feature columns emitted
    by ``with_audio_features`` — pure Catalyst (whole-stage codegen), no
    Python.  NULL means the clip passes the audio gate."""
    return (
        F.when(~F.col("decode_ok"), F.lit("decode_error"))
        .when(
            F.col("dur_ms_measured") < F.lit(th.min_dur_ms),
            F.lit("too_short_audio"),
        )
        .when(
            F.col("silence_ratio") > F.lit(th.max_silence_ratio),
            F.lit("silent"),
        )
        .when(
            F.col("clipping_ratio") > F.lit(th.max_clipping_ratio),
            F.lit("clipped"),
        )
    )


def with_audio_keep_drop(
    df: DataFrame, th: AudioGateThresholds = DEFAULT_AUDIO_GATE
) -> DataFrame:
    """Audio-quality gate: decode + feature-extract (one Arrow boundary)
    then keep/drop entirely in Catalyst.  Appends ``audio_drop_reason``
    (NULL = keep) and ``audio_keep``.  Composes with the transcript gate
    (``operators.quality.with_keep_drop``) for a full multimodal filter:
    the two reason columns stay separate so counters can attribute drops
    to the right modality."""
    feats = with_audio_features(df)
    reason = audio_drop_reason_col(th)
    return feats.withColumn("audio_drop_reason", reason).withColumn(
        "audio_keep", reason.isNull()
    )


def resampled_clips(df: DataFrame, target_sr: int = 16000) -> DataFrame:
    """Re-encode every clip at a uniform sample rate (decode → linear
    resample → pcm16) — the audio 'resize'.  Output schema matches the
    clips table with sr_hz = target_sr and codec = pcm16."""
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)

    def run(iterator):
        from ..kernel.audio import decode, encode, resample

        for pdf in iterator:
            out_bytes, out_sr = [], []
            for data, codec, sr in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"]):
                pcm = resample(decode(bytes(data), codec), int(sr), target_sr)
                out_bytes.append(encode(pcm, "pcm16"))
                out_sr.append(target_sr)
            pdf = pdf.copy()
            pdf["bytes"] = out_bytes
            pdf["sr_hz"] = out_sr
            pdf["codec"] = "pcm16"
            yield pdf

    return df.mapInPandas(run, schema=schema)


def frame_energy_df(
    df: DataFrame, frame_ms: int = 25, hop_ms: int = 10
) -> DataFrame:
    """clip_id + per-frame RMS energy in dB (the audio 'frame-sample')."""

    def run(iterator):
        import pandas as pd

        from ..kernel.audio import decode, frame_features

        for pdf in iterator:
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "frame_db": [
                        frame_features(
                            decode(bytes(b), c), int(sr), frame_ms, hop_ms
                        ).tolist()
                        for b, c, sr in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"])
                    ],
                }
            )

    return df.mapInPandas(run, schema="clip_id string, frame_db array<float>")


def decoded_pcm_df(df: DataFrame) -> DataFrame:
    """clip_id + decoded PCM as array<float> — test/verification path only."""

    def run(iterator):
        import pandas as pd

        from ..kernel.audio import decode

        for pdf in iterator:
            yield pd.DataFrame(
                {
                    "clip_id": pdf["clip_id"],
                    "pcm": [
                        decode(bytes(b), c).tolist()
                        for b, c in zip(pdf["bytes"], pdf["codec"])
                    ],
                }
            )

    return df.mapInPandas(run, schema="clip_id string, pcm array<float>")
