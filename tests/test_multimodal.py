"""Multimodal column plumbing: schema, Arrow batch shape, stubbed codec
error channel, deterministic FAKE decode features."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.functions.multimodal import (
    decode_fake,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    featurize_media,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, encode_fake_image(64, 48, 3, seed=1)),
        (2, encode_fake_audio(16000, 32000, seed=2)),
        (3, encode_fake_video(32, 24, 10, seed=3)),
        (4, b"\xff\xd8\xff\xe0 jpeg really has no codec here"),
        (5, b""),
        (6, b"\x89PNG\r\n\x1a\n corrupt png body"),
    ]
    return spark.createDataFrame(rows, ["media_id", "payload"])


def test_featurize_schema_and_rows(media_df):
    out = featurize_media(media_df)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 6

    img = rows[1]
    assert (img.kind, img.width, img.height, img.channels) == ("image", 64, 48, 3)
    assert len(img.feature_vec) == 16
    assert abs(sum(img.feature_vec) - 1.0) < 1e-5  # histogram sums to 1

    au = rows[2]
    assert au.kind == "audio" and au.sample_rate == 16000
    assert abs(au.duration_s - 2.0) < 1e-9
    assert len(au.feature_vec) == 8

    vid = rows[3]
    assert vid.kind == "video" and vid.n_frames == 10
    assert len(vid.feature_vec) == 5  # every 2nd frame of 10

    # real format without codec (JPEG) -> NotImplementedError -> error row
    assert rows[4].error is not None and rows[4].error.startswith("no_codec")
    assert rows[5].error is not None
    # PNG has a REAL stdlib codec now (kernels/media_codecs.py): a
    # corrupt body is a decode error, not a missing codec
    assert rows[6].error is not None and rows[6].error.startswith("bad_media")


def test_decode_deterministic():
    blob = encode_fake_image(16, 8, 1, seed=9)
    a = decode_fake(blob)["pixels"]
    b = decode_fake(blob)["pixels"]
    assert (a == b).all()
    with pytest.raises(NotImplementedError):
        decode_fake(b"RIFFxxxxWAVE")


def test_feature_join_with_ann(spark, media_df):
    # features feed the similarity operators unchanged
    from pdf_parser_spark.functions import brute_force_cosine_topk

    feats = (
        featurize_media(media_df)
        .filter("error IS NULL AND kind = 'image'")
        .select(F.col("media_id").alias("vec_id"), F.col("feature_vec").alias("embedding"))
    )
    more = spark.createDataFrame(
        [(100 + i, encode_fake_image(64, 48, 3, seed=100 + i)) for i in range(4)],
        ["media_id", "payload"],
    )
    feats2 = (
        featurize_media(more)
        .select(F.col("media_id").alias("vec_id"), F.col("feature_vec").alias("embedding"))
        .unionByName(feats)
    )
    out = brute_force_cosine_topk(feats2, feats, k=2)
    assert out.count() == 2


def test_probe_jpeg_header_roundtrip():
    from pdf_parser_spark.kernels.media_codecs import (
        MediaError,
        encode_jpeg_header,
        probe_jpeg,
    )

    p = probe_jpeg(encode_jpeg_header(640, 480, 3))
    assert (p["width"], p["height"], p["channels"]) == (640, 480, 3)
    assert p["pixels"] is None
    # grayscale, and a progressive (SOF2) frame header
    g = encode_jpeg_header(31, 17, 1)
    assert probe_jpeg(g)["channels"] == 1
    prog = bytearray(g)
    prog[prog.index(0xC0, 2)] = 0xC2  # SOF0 -> SOF2 marker byte
    assert probe_jpeg(bytes(prog))["width"] == 31
    import pytest as _pytest

    with _pytest.raises(MediaError):
        probe_jpeg(b"\xff\xd8\xff\xe0no-jpeg-codec-here")


def test_probe_mp4_header_roundtrip():
    from pdf_parser_spark.kernels.media_codecs import (
        MediaError,
        encode_mp4_header,
        probe_mp4,
    )

    p = probe_mp4(encode_mp4_header(1280, 720, 300, 600, 6000))
    assert (p["width"], p["height"]) == (1280, 720)
    assert p["n_frames"] == 300
    assert p["duration_s"] == 10.0
    assert p["frames"] is None
    import pytest as _pytest

    with _pytest.raises(MediaError):
        probe_mp4(b"\x00\x00\x00\x08ftyp")  # no moov


def test_featurize_probe_rows(spark):
    """JPEG/MP4 header-only payloads: metadata columns fill, decode is
    marked stubbed, pixel-derived fields stay NULL."""
    from pdf_parser_spark.functions.multimodal import (
        build_demo_media,
        featurize_media,
    )

    media = spark.createDataFrame(
        build_demo_media(), "media_id long, payload binary"
    )
    rows = {r.media_id: r for r in featurize_media(media).collect()}
    jpeg = rows[26]
    assert (jpeg.kind, jpeg.width, jpeg.height, jpeg.channels) == (
        "image", 640, 480, 3,
    )
    assert jpeg.error.startswith("decode_stubbed:")
    assert jpeg.mean_intensity is None and jpeg.feature_vec is None
    mp4 = rows[27]
    assert (mp4.kind, mp4.width, mp4.height, mp4.n_frames) == (
        "video", 1280, 720, 300,
    )
    assert mp4.duration_s == 10.0
    assert mp4.error.startswith("decode_stubbed:")
    # the pure error rows keep their original classes
    assert rows[24].error.startswith("no_codec:")
    assert rows[25].error.startswith("bad_media:")
