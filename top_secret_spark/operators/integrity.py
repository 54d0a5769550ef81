"""Metadata-integrity audit over the clips table — the cheap pre-gate.

At 10^12 rows the most expensive mistake is shipping a corrupt shard
into the decode boundary: every downstream stage pays Python/Arrow cost
for rows that a byte-length check could have rejected at scan speed.
This operator cross-checks the DECLARED metadata (sr_hz, dur_ms, codec)
against the PAYLOAD ITSELF (byte length, codec frame alignment) using
nothing but Catalyst expressions — zero decode, zero Python, one
whole-stage-codegen projection that runs at parquet-scan speed and
pushes `length(bytes)` evaluation down next to the scan.

Violation taxonomy (first match wins, NULL = consistent):

- ``unknown_codec``    — codec tag outside the decodable set; the decode
                         boundary would raise, so name it here for free.
- ``missing_metadata`` — NULL sr_hz / dur_ms / codec.
- ``bad_sample_rate``  — sr_hz outside [4_000, 192_000]; a zero or
                         negative rate poisons every duration-derived
                         feature downstream.
- ``empty_payload``    — zero bytes but a positive declared duration.
- ``misaligned_payload`` — pcm16 payload with an odd byte count: the
                         final sample is torn, which usually means a
                         truncated object-store read.
- ``duration_mismatch`` — |implied - declared| > tol_ms, where implied
                         duration is derived from byte length, codec
                         bytes-per-sample, and sr_hz.

``implied_dur_ms`` is emitted only when it is structurally computable
(known codec, sane rate, aligned payload) so a downstream consumer can
never read an authoritative-looking number off a broken row — the same
ok-flag discipline as ``with_snr_estimate`` (operators/audio.py).

Reference parity note: thoughtbot/top_secret validates its inputs at
the API edge (lib/top_secret/text.rb raises on non-string input); this
is the table-scale analog the north rule's Iceberg ingest needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernel.audio import BYTES_PER_SAMPLE

# codec -> samples per payload byte for every codec this engine decodes
# (kernel/audio.py SUPPORTED_CODECS); anything else is unknown_codec
# here and decode_error at the decode boundary.  The ratio (not
# bytes-per-sample) keeps the nibble codec exact: IMA ADPCM packs two
# 4-bit samples per byte, so its payload→sample relation is x2 — still
# pure Catalyst arithmetic, no decode needed for the audit.
_SAMPLES_PER_BYTE = {
    # derived from the kernel's one bytes-per-sample map...
    **{c: 1.0 / w for c, w in BYTES_PER_SAMPLE.items()},
    # ...plus the nibble codec, which that int map cannot carry: IMA
    # ADPCM packs two 4-bit samples per byte
    "adpcm": 2.0,
}

SR_MIN, SR_MAX = 4_000, 192_000


def _samples_per_byte_col() -> Column:
    expr = F.lit(None).cast("double")
    for codec, spb in _SAMPLES_PER_BYTE.items():
        expr = F.when(F.col("codec") == codec, F.lit(spb)).otherwise(expr)
    return expr


def meta_violation_col(tol_ms: int = 20) -> Column:
    """First-match violation name (NULL = consistent), pure Catalyst."""
    spb = _samples_per_byte_col()
    nbytes = F.length(F.col("bytes"))
    implied_ms = (
        F.lit(1000.0)
        * (nbytes * spb).cast("double")
        / F.col("sr_hz").cast("double")
    )
    return (
        # NULL payload first: every later arm compares against
        # length(bytes), and NULL comparisons silently skip a when() —
        # the corrupt-shard state this audit exists to quarantine must
        # never read as consistent
        F.when(F.col("bytes").isNull(), F.lit("missing_payload"))
        .when(
            # before unknown_codec: a NULL codec is MISSING metadata
            # (the documented taxonomy), not an unrecognized tag
            F.col("sr_hz").isNull()
            | F.col("dur_ms").isNull()
            | F.col("codec").isNull(),
            F.lit("missing_metadata"),
        )
        .when(spb.isNull(), F.lit("unknown_codec"))
        .when(
            (F.col("sr_hz") < SR_MIN) | (F.col("sr_hz") > SR_MAX),
            F.lit("bad_sample_rate"),
        )
        .when(
            (nbytes == 0) & (F.col("dur_ms") > 0), F.lit("empty_payload")
        )
        .when(
            (F.col("codec") == "pcm16") & (nbytes % 2 != 0),
            F.lit("misaligned_payload"),
        )
        .when(
            F.abs(implied_ms - F.col("dur_ms").cast("double"))
            > F.lit(float(tol_ms)),
            F.lit("duration_mismatch"),
        )
    )


def with_metadata_audit(df: DataFrame, tol_ms: int = 20) -> DataFrame:
    """Append ``meta_violation`` (NULL = consistent) and
    ``implied_dur_ms`` (NULL unless structurally computable).

    Plan shape: one codegen'd projection over the scan — no decode, no
    Python, no Exchange.  Run it FIRST and route violations to a
    quarantine sink; every downstream Arrow boundary then only ever
    sees rows whose payload matches its own metadata."""
    violation = meta_violation_col(tol_ms)
    spb = _samples_per_byte_col()
    computable = (
        spb.isNotNull()
        & F.col("sr_hz").isNotNull()
        & (F.col("sr_hz") >= SR_MIN)
        & (F.col("sr_hz") <= SR_MAX)
        & ~((F.col("codec") == "pcm16") & (F.length("bytes") % 2 != 0))
    )
    implied = F.when(
        computable,
        F.round(
            F.lit(1000.0)
            * (F.length("bytes") * spb).cast("double")
            / F.col("sr_hz").cast("double"),
            3,
        ),
    )
    return df.withColumn("meta_violation", violation).withColumn(
        "implied_dur_ms", implied
    )
