"""Multimodal (image/video) kernel + Spark operator tests.

The raw_rgb8 codecs are real; jpeg/h264/... are stubbed (no decoder
libraries in this environment) — the stub must fail loudly, and the
Spark plumbing (schema, batch shape, determinism across partitionings)
is tested for real.
"""

import numpy as np
import pytest

from top_secret_spark.kernel.media import (
    decode_image,
    decode_video,
    encode_image,
    encode_video,
    image_features,
    resize_nearest,
    sample_frames,
    synth_image,
    synth_video,
)


def test_image_roundtrip_exact():
    img = synth_image(7, 24, 18)
    assert img.shape == (18, 24, 3) and img.dtype == np.uint8
    back = decode_image(encode_image(img), "raw_rgb8", 24, 18)
    np.testing.assert_array_equal(img, back)


def test_video_roundtrip_and_frame_order():
    vid = synth_video(9, 10, 8, 5)
    back = decode_video(encode_video(vid), "raw_rgb8_frames", 10, 8, 5)
    np.testing.assert_array_equal(vid, back)
    # frame order is observable (brightness drifts per frame)
    assert not np.array_equal(back[0], back[1])


def test_stub_codecs_raise():
    img = synth_image(1, 4, 4)
    with pytest.raises(NotImplementedError, match="jpeg"):
        encode_image(img, "jpeg")
    with pytest.raises(NotImplementedError, match="h264"):
        decode_video(b"", "h264", 4, 4, 1)


def test_byte_count_validation():
    with pytest.raises(ValueError):
        decode_image(b"\x00" * 10, "raw_rgb8", 4, 4)


def test_resize_nearest_shape_and_identity():
    img = synth_image(3, 16, 12)
    small = resize_nearest(img, 8, 6)
    assert small.shape == (6, 8, 3)
    np.testing.assert_array_equal(resize_nearest(img, 16, 12), img)


def test_sample_frames_count():
    vid = synth_video(2, 6, 4, 7)
    assert sample_frames(vid, 2).shape[0] == 4  # ceil(7/2)
    assert sample_frames(vid, 3).shape[0] == 3


def test_image_features_known_values():
    img = np.full((4, 4, 3), 128, dtype=np.uint8)
    f = image_features(img)
    assert f["mean_r"] == 128.0 and f["brightness"] == 128.0
    assert f["contrast"] == 0.0


@pytest.fixture(scope="module")
def media(spark):
    from top_secret_spark.operators.multimodal import media_df

    df = media_df(spark, 64, partitions=4).cache()
    df.count()
    yield df
    df.unpersist()


def test_media_generation_partitioning_independent(spark, media):
    from top_secret_spark.operators.multimodal import media_df

    a = {r["media_id"]: bytes(r["bytes"]) for r in media.collect()}
    b = {
        r["media_id"]: bytes(r["bytes"])
        for r in media_df(spark, 64, partitions=7).collect()
    }
    assert a == b


def test_media_features_shapes_match_metadata(media):
    from top_secret_spark.operators.multimodal import with_media_features

    feats = {r["media_id"]: r for r in with_media_features(media).collect()}
    for r in media.select("media_id", "kind", "width", "height", "n_frames").collect():
        f = feats[r["media_id"]]
        assert (f["dec_width"], f["dec_height"]) == (r["width"], r["height"])
        assert f["dec_frames"] == (r["n_frames"] if r["kind"] == "video" else 1)
        assert 0.0 <= f["brightness"] <= 255.0


def test_media_features_null_metadata_fails_loudly(spark, media):
    """A null in a groupby key column must NOT silently drop the row
    (pandas groupby default dropna=True would) — it falls to the per-row
    decode path, which raises (ADVICE r2)."""
    import pytest
    from pyspark.sql import functions as F

    from top_secret_spark.operators.multimodal import with_media_features

    broken = media.withColumn(
        "width",
        F.when(F.col("media_id") == "media-0000000001", F.lit(None)).otherwise(
            F.col("width")
        ),
    )
    with pytest.raises(Exception):
        with_media_features(broken).collect()


def test_resized_media_redecodes(spark, media):
    from top_secret_spark.operators.multimodal import resized_media, with_media_features

    small = resized_media(media, 5, 4)
    feats = with_media_features(small).collect()
    assert len(feats) == media.count()
    assert all((f["dec_width"], f["dec_height"]) == (5, 4) for f in feats)


def test_sampled_frames(spark, media):
    from top_secret_spark.operators.multimodal import sampled_frames_df

    frames = sampled_frames_df(media, every_k=2).collect()
    vids = media.filter("kind = 'video'").select("media_id", "n_frames").collect()
    expected = sum((r["n_frames"] + 1) // 2 for r in vids)
    assert len(frames) == expected
    by_id = {}
    for f in frames:
        by_id.setdefault(f["media_id"], []).append(f["frame_idx"])
    for r in vids:
        assert sorted(by_id[r["media_id"]]) == list(range(0, r["n_frames"], 2))


def test_stacked_stats_match_per_row_loop(spark):
    """The same-shape stacked fast path must produce byte-identical stats
    to the per-row decode loop (duplicate shapes force group sizes > 1)."""
    import numpy as np

    from top_secret_spark.kernel.media import (
        decode_image,
        decode_video,
        image_features,
    )
    from top_secret_spark.operators.multimodal import (
        media_df,
        with_media_features,
    )

    media = media_df(spark, 64, partitions=2)
    rows = {r["media_id"]: r for r in media.collect()}
    got = {r["media_id"]: r for r in with_media_features(media).collect()}
    assert set(got) == set(rows)
    for mid, src in rows.items():
        g = got[mid]
        if src["kind"] == "video":
            frames = decode_video(
                src["bytes"], src["codec"], src["width"], src["height"],
                src["n_frames"],
            ).astype(np.float64)
            assert g["dec_frames"] == src["n_frames"]
            assert abs(g["brightness"] - frames.mean()) < 1e-9
            assert abs(g["contrast"] - frames.std()) < 1e-9
            assert abs(g["mean_r"] - frames[..., 0].mean()) < 1e-9
        else:
            feats = image_features(
                decode_image(src["bytes"], src["codec"], src["width"],
                             src["height"])
            )
            for k in ("mean_r", "mean_g", "mean_b", "brightness", "contrast"):
                assert abs(g[k] - feats[k]) < 1e-9, (mid, k)


# --- real BMP container codec (round 5) --------------------------------------


def test_bmp_roundtrip_exact():
    from top_secret_spark.kernel.media import decode_bmp, encode_bmp

    for w, h in ((24, 18), (7, 5), (1, 1), (33, 2)):  # odd widths hit padding
        img = synth_image(100 + w, w, h)
        back = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(img, back)


def test_bmp_top_down_rows():
    import struct

    from top_secret_spark.kernel.media import decode_bmp, encode_bmp

    img = synth_image(3, 6, 4)
    data = bytearray(encode_bmp(img))
    # flip to top-down: negate biHeight and reverse the row order
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    stride = (6 * 3 + 3) & ~3
    off = struct.unpack_from("<I", data, 10)[0]
    rows = [bytes(data[off + i * stride: off + (i + 1) * stride]) for i in range(h)]
    data[off:] = b"".join(reversed(rows))
    np.testing.assert_array_equal(img, decode_bmp(bytes(data)))


def test_bmp_rejects_wrong_variants():
    from top_secret_spark.kernel.media import decode_bmp, encode_bmp

    with pytest.raises(ValueError, match="BM"):
        decode_bmp(b"notabmp" * 10)
    img = synth_image(5, 8, 8)
    data = bytearray(encode_bmp(img))
    data[28] = 32  # bpp 24 -> 32
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(data))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(encode_bmp(img)[:-10]))


def test_bmp_through_decode_image_and_spark(spark):
    import pandas as pd
    from top_secret_spark.kernel.media import encode_bmp
    from top_secret_spark.operators.multimodal import (
        MEDIA_SCHEMA_DDL,
        with_media_features,
    )

    rows = []
    for r in range(8):
        w, h = 8 + r, 6 + r
        img = synth_image(500 + r, w, h)
        rows.append((f"bmp-{r}", "image", bytearray(encode_bmp(img)),
                     "bmp", w, h, 1, 0.0))
    df = spark.createDataFrame(rows, MEDIA_SCHEMA_DDL)
    feats = {x["media_id"]: x for x in with_media_features(df).collect()}
    assert len(feats) == 8
    for r in range(8):
        f = feats[f"bmp-{r}"]
        assert (f["dec_width"], f["dec_height"]) == (8 + r, 6 + r)
    # metadata/container mismatch fails loudly (container authoritative)
    bad = spark.createDataFrame(
        [("bad", "image", bytearray(encode_bmp(synth_image(1, 4, 4))),
          "bmp", 9, 9, 1, 0.0)], MEDIA_SCHEMA_DDL)
    with pytest.raises(Exception, match="authoritative|container"):
        with_media_features(bad).collect()
