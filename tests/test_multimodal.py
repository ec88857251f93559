"""Multimodal binary-column plumbing (stubbed decode, real Spark shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_3_0_0_src_spark.operators.multimodal import (
    extract_media_meta, frame_sample_plan, media_feature_vectors,
)


def media_df(spark):
    rows = [
        (1, b"\x89PNG\r\n\x1a\n" + b"x" * 100),
        (2, b"\xff\xd8\xff" + b"y" * 50),
        (3, b"RIFF" + b"\0\0\0\0" + b"WAVE" + b"z" * 20),
        (4, b"\0\0\0\x18ftypmp42" + b"v" * 64),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_media_meta_types_and_determinism(spark):
    df = media_df(spark)
    out = {r["doc_id"]: r for r in extract_media_meta(df).collect()}
    assert out[1]["media_type"] == "image/png"
    assert out[2]["media_type"] == "image/jpeg"
    assert out[3]["media_type"] == "audio/wav"
    assert out[4]["media_type"] == "video/mp4"
    assert out[5]["media_type"] == "empty" and out[5]["byte_len"] == 0
    assert out[1]["byte_len"] == 108
    again = {r["doc_id"]: r for r in extract_media_meta(df).collect()}
    assert out[1] == again[1]  # deterministic stub


def test_feature_vectors_shape(spark):
    out = media_feature_vectors(media_df(spark), dim=16).collect()
    assert all(len(r["feature"]) == 16 for r in out)
    vals = [v for r in out for v in r["feature"]]
    assert all(-0.5 <= v <= 0.5 for v in vals)


def test_frame_sample_plan_fanout(spark):
    plan = frame_sample_plan(media_df(spark).filter(F.col("payload").isNotNull()),
                             every_n=10)
    rows = plan.collect()
    assert len(rows) >= 4  # at least one frame per media row
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
