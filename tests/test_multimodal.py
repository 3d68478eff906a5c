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
