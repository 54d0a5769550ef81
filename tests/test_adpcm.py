"""IMA/DVI ADPCM codec kernel (kernel/audio.py).

The decisive evidence here is CROSS-IMPLEMENTATION bit-exactness: both
directions of the numpy kernel are compared byte-for-byte / sample-for-
sample against the stdlib's independent C implementation
(audioop.lin2adpcm / adpcm2lin) — not a round-trip self-check, which
would pass even if both directions shared a mirrored bug.  audioop is
deprecated (removed in Python 3.13), so those tests skip cleanly when
it is absent; the pure-numpy scan is the durable path and is exercised
directly (dispatch is forced past the audioop fast path).

Reference semantics matched: thoughtbot/top_secret has no audio layer;
the codec contract here is BASELINE.json's input_hint (binary payload +
codec tag, decoded-PCM invariant).
"""

from __future__ import annotations

import numpy as np
import pytest

from top_secret_spark.kernel import audio as ka
from top_secret_spark.kernel.audio import (
    SEEKABLE_CODECS,
    SUPPORTED_CODECS,
    adpcm_decode,
    adpcm_encode,
    batch_adpcm_decode,
    batch_adpcm_encode,
    batch_decode,
    decode,
    encode,
    float_to_pcm16,
    snr_db,
    synth_pcm,
)

try:
    import audioop
except Exception:  # pragma: no cover - 3.13+
    audioop = None

needs_audioop = pytest.mark.skipif(
    audioop is None, reason="stdlib audioop absent (removed in 3.13)"
)


def _rand_int16(rng, n, smooth=False):
    if smooth:
        x = np.cumsum(rng.integers(-2000, 2001, n))
        return np.clip(x, -32768, 32767).astype(np.int32)
    return rng.integers(-32768, 32768, n).astype(np.int32)


def _numpy_scan_decode(datas):
    """Force the self-contained numpy path regardless of audioop."""
    saved = ka._audioop
    ka._audioop = None
    try:
        return batch_adpcm_decode(datas)
    finally:
        ka._audioop = saved


def _numpy_scan_encode(samples, lengths):
    """Force the self-contained numpy encode path regardless of audioop."""
    saved = ka._audioop
    ka._audioop = None
    try:
        return batch_adpcm_encode(samples, lengths)
    finally:
        ka._audioop = saved


# --- cross-implementation bit-exactness ---------------------------------------


@needs_audioop
def test_encode_bit_exact_vs_audioop():
    rng = np.random.default_rng(7)
    for trial in range(40):
        n = int(rng.integers(1, 500)) * 2
        x = _rand_int16(rng, n, smooth=bool(trial % 2))
        ref, _ = audioop.lin2adpcm(x.astype("<i2").tobytes(), 2, None)
        f = x.astype(np.float64) / 32767.0
        # BOTH dispatch arms: the default (C loop when present) and the
        # forced numpy sample-major scan must each match the stdlib
        assert batch_adpcm_encode(f, np.array([n]))[0] == ref
        assert _numpy_scan_encode(f, np.array([n]))[0] == ref


@needs_audioop
def test_decode_bit_exact_vs_audioop_both_dispatch_arms():
    rng = np.random.default_rng(11)
    for trial in range(40):
        n = int(rng.integers(1, 500)) * 2
        x = _rand_int16(rng, n, smooth=bool(trial % 2))
        enc, _ = audioop.lin2adpcm(x.astype("<i2").tobytes(), 2, None)
        ref = np.frombuffer(
            audioop.adpcm2lin(enc, 2, None)[0], "<i2"
        ).astype(np.int16)
        for arm in (batch_adpcm_decode, _numpy_scan_decode):
            s, lens = arm([enc])
            assert lens[0] == n
            got = float_to_pcm16(s)
            assert np.array_equal(got, ref)


@needs_audioop
def test_ragged_batch_decode_matches_per_clip():
    rng = np.random.default_rng(13)
    datas = []
    for _ in range(60):
        n = int(rng.integers(1, 300)) * 2
        x = _rand_int16(rng, n)
        datas.append(audioop.lin2adpcm(x.astype("<i2").tobytes(), 2, None)[0])
    datas.append(b"")  # empty payload rides along
    for arm in (batch_adpcm_decode, _numpy_scan_decode):
        s, lens = arm(datas)
        assert lens[-1] == 0
        off = 0
        for d, L in zip(datas, lens):
            ref = np.frombuffer(
                audioop.adpcm2lin(bytes(d), 2, None)[0], "<i2"
            ) if len(d) else np.empty(0, "<i2")
            assert np.array_equal(
                float_to_pcm16(s[off:off + L]), ref.astype(np.int16)
            )
            off += L


def test_grouped_scan_matches_ungrouped_on_skewed_batch(monkeypatch):
    # one long clip + many short: the dense scans run in length-sorted
    # groups bounded by _ADPCM_GROUP_ELEMS so the padded matrix is never
    # O(n_clips × max_len); a tiny budget forces MANY groups and the
    # result must be bit-identical, in input order, to the single-group
    # run (budget of one group per clip is the degenerate extreme)
    rng = np.random.default_rng(23)
    clips = [rng.random(int(rng.integers(0, 90))).astype(np.float32) * 2 - 1
             for _ in range(40)]
    clips.insert(7, rng.random(4001).astype(np.float32) * 2 - 1)  # odd + long
    flat = np.concatenate(clips)
    lens = np.array([len(c) for c in clips], dtype=np.int64)

    ref_enc = _numpy_scan_encode(flat, lens)
    ref_dec = _numpy_scan_decode(ref_enc)
    monkeypatch.setattr(ka, "_ADPCM_GROUP_ELEMS", 512)
    got_enc = _numpy_scan_encode(flat, lens)
    got_dec = _numpy_scan_decode(ref_enc)
    assert got_enc == ref_enc
    assert np.array_equal(ref_dec[1], got_dec[1])
    assert np.array_equal(
        float_to_pcm16(ref_dec[0]), float_to_pcm16(got_dec[0])
    )


def test_numpy_scan_matches_dispatch_default():
    # when audioop IS present the dispatch uses it; the numpy scan must
    # agree bit-for-bit (when absent, both arms are the same code path)
    rng = np.random.default_rng(17)
    datas = []
    for _ in range(20):
        n = int(rng.integers(1, 200)) * 2
        x = rng.random(n).astype(np.float32) * 2 - 1
        datas.append(adpcm_encode(x))
    sa, la = batch_adpcm_decode(datas)
    sb, lb = _numpy_scan_decode(datas)
    assert np.array_equal(la, lb)
    assert np.array_equal(float_to_pcm16(sa), float_to_pcm16(sb))


# --- contract: padding, round-trip, dispatch ----------------------------------


def test_odd_length_repeat_pads_to_even():
    x = synth_pcm(5, 333, 8000)
    enc = adpcm_encode(x)
    assert len(enc) == (333 + 1) // 2
    dec = adpcm_decode(enc)
    assert len(dec) == 334  # even-rounded: audioop would DROP sample 333
    # the pad sample continues the signal (repeat of the last input)
    assert abs(float(dec[-1]) - float(dec[-2])) < 0.05


def test_roundtrip_snr_on_speech_band_signal():
    pcm = synth_pcm(1234, 9600, 16000)
    dec = adpcm_decode(adpcm_encode(pcm))
    assert snr_db(pcm, dec[: len(pcm)]) >= 25.0


def test_encode_decode_via_codec_tag_and_batch_decode():
    pcm = synth_pcm(99, 1600, 8000)
    data = encode(pcm, "adpcm")
    assert np.array_equal(
        float_to_pcm16(decode(data, "adpcm")),
        float_to_pcm16(adpcm_decode(data)),
    )
    s, lens = batch_decode([data, data], "adpcm")
    assert list(lens) == [1600, 1600]
    assert np.array_equal(s[:1600], s[1600:])


def test_supported_vs_seekable_split():
    assert "adpcm" in SUPPORTED_CODECS
    assert "adpcm" not in SEEKABLE_CODECS
    assert set(SEEKABLE_CODECS) < set(SUPPORTED_CODECS)


def test_empty_batch_and_empty_payload():
    s, lens = batch_adpcm_decode([])
    assert len(s) == 0 and len(lens) == 0
    s, lens = batch_adpcm_decode([b""])
    assert len(s) == 0 and list(lens) == [0]
    assert batch_adpcm_encode(np.empty(0, np.float32), np.array([0])) == [b""]


# --- Spark integration ---------------------------------------------------------


@pytest.fixture(scope="module")
def adpcm_clips(spark):
    import pandas as pd

    rows = []
    for r in range(24):
        n = 320 + 16 * r
        pcm = synth_pcm(1000 + r, n, 8000)
        rows.append(
            {
                "clip_id": f"ad-{r:04d}",
                "bytes": encode(pcm, "adpcm"),
                "sr_hz": 8000,
                "dur_ms": int(1000 * n / 8000),
                "codec": "adpcm",
                "transcript": f"adpcm probe {r}",
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["sr_hz"] = pdf["sr_hz"].astype("int32")
    pdf["dur_ms"] = pdf["dur_ms"].astype("int32")
    return spark.createDataFrame(pdf)


def test_decode_boundary_accepts_adpcm(spark, adpcm_clips):
    from top_secret_spark.operators.audio import with_audio_features

    feats = with_audio_features(adpcm_clips).toPandas()
    assert feats["decode_ok"].all()
    assert (feats["rms"] > 0.05).all()
    # measured duration reflects the decoded (even-rounded) count
    assert (feats["dur_ms_measured"] == feats["dur_ms"]).all()


def test_metadata_audit_knows_adpcm(spark, adpcm_clips):
    from top_secret_spark.operators.integrity import with_metadata_audit

    audited = with_metadata_audit(adpcm_clips).toPandas()
    assert audited["meta_violation"].isna().all()
    assert np.allclose(
        audited["implied_dur_ms"], audited["dur_ms"], atol=1.0
    )


def test_trim_raises_for_stateful_codec(spark, adpcm_clips):
    from top_secret_spark.operators.audio import trimmed_clips

    with pytest.raises(Exception, match="byte-sliceable"):
        trimmed_clips(adpcm_clips).collect()


def test_transcode_adpcm_to_pcm16_holds_decoded_signal(spark, adpcm_clips):
    from top_secret_spark.operators.audio import transcode_clips

    out = transcode_clips(adpcm_clips, "pcm16").toPandas().set_index("clip_id")
    for r in range(0, 24, 7):
        row = out.loc[f"ad-{r:04d}"]
        n = 320 + 16 * r
        ref = adpcm_decode(encode(synth_pcm(1000 + r, n, 8000), "adpcm"))
        got = decode(bytes(row["bytes"]), "pcm16")
        assert len(got) == len(ref)
        assert snr_db(ref, got) >= 80.0  # pcm16 re-quantization only


def test_chunk_and_mask_flag_adpcm_passthrough(spark, adpcm_clips):
    """adpcm DECODES fine downstream, so a byte-slice operator that
    skips it must say so in-band: chunked_clips emits the row as one
    chunk with chunked=false, time_masked_clips leaves the payload
    byte-identical with masked=false — without the flags an over-length
    or augmentation-free adpcm corpus would sail through every gate."""
    from top_secret_spark.operators.audio import (
        chunked_clips,
        time_masked_clips,
    )

    chunks = chunked_clips(adpcm_clips, max_dur_ms=10).toPandas()
    assert len(chunks) == 24  # one passthrough chunk per clip
    assert (~chunks["chunked"]).all()
    assert (chunks["chunk_idx"] == 0).all()

    src = adpcm_clips.toPandas().set_index("clip_id")
    masked = time_masked_clips(adpcm_clips, mask_ms=50).toPandas()
    assert (~masked["masked"]).all()
    for _, row in masked.iterrows():
        assert bytes(row["bytes"]) == bytes(src.loc[row["clip_id"], "bytes"])


def test_chunk_and_mask_flag_true_for_seekable(spark):
    import pandas as pd

    from top_secret_spark.operators.audio import (
        chunked_clips,
        time_masked_clips,
    )

    pcm = synth_pcm(42, 8000, 8000)
    pdf = pd.DataFrame([
        {"clip_id": "pc-0", "bytes": encode(pcm, "pcm16"), "sr_hz": 8000,
         "dur_ms": 1000, "codec": "pcm16", "transcript": "x"},
    ])
    pdf["sr_hz"] = pdf["sr_hz"].astype("int32")
    pdf["dur_ms"] = pdf["dur_ms"].astype("int32")
    df = spark.createDataFrame(pdf)
    chunks = chunked_clips(df, max_dur_ms=100).toPandas()
    assert chunks["chunked"].all() and len(chunks) == 10
    masked = time_masked_clips(df, mask_ms=50).toPandas()
    assert masked["masked"].all()
