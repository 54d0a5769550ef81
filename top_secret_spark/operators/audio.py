"""Audio decode / validate / feature-extract operators.

Decode runs inside ``mapInPandas`` — one vectorized numpy decode per
Arrow batch, never per-row Python.  The pipeline does NOT materialize
raw PCM into the output table (at 10^12 clips that would be a multi-PB
write amplification); it validates decodability and extracts cheap
features instead.  ``decoded_pcm_df`` materializes PCM for tests and the
SNR passthrough gate only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FEATURES_SCHEMA_SUFFIX = (
    "decode_ok boolean, rms double, zcr double, dur_ms_measured int"
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

        from ..kernel.audio import SUPPORTED_CODECS, audio_features, decode

        for pdf in iterator:
            oks, rmss, zcrs, durs = [], [], [], []
            for data, codec, sr in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"]):
                if data is None or codec not in SUPPORTED_CODECS:
                    oks.append(False)
                    rmss.append(0.0)
                    zcrs.append(0.0)
                    durs.append(0)
                    continue
                pcm = decode(bytes(data), codec)
                feats = audio_features(np.asarray(pcm), int(sr))
                oks.append(True)
                rmss.append(feats["rms"])
                zcrs.append(feats["zcr"])
                durs.append(feats["dur_ms_measured"])
            pdf = pdf.drop(columns=["bytes"])
            pdf["decode_ok"] = oks
            pdf["rms"] = rmss
            pdf["zcr"] = zcrs
            pdf["dur_ms_measured"] = durs
            yield pdf

    return df.mapInPandas(run, schema=schema)


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
