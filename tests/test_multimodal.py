"""Multimodal plumbing tests: schema, Arrow batch flow, determinism of
the stubbed featurizer, frame-sample explode shape."""

import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.multimodal import (
    FEATURE_DIM, MEDIA_SCHEMA, featurize_media, frame_sample_plan,
)

ROWS = [
    ("img-1", "image", b"\x89PNG....fakebytes", "image/png", 64, 48, None),
    ("img-2", "image", b"\xff\xd8\xff jpeg-ish", "image/jpeg", 32, 32, None),
    ("vid-1", "video", b"\x00\x00ftypmp42", "video/mp4", 640, 360, 4200),
    ("aud-1", "audio", None, "audio/wav", None, None, 1000),
]


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(ROWS, MEDIA_SCHEMA)


def test_featurize_schema_and_shape(spark, media):
    out = featurize_media(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {"img-1", "img-2", "vid-1", "aud-1"}
    for r in rows.values():
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
    assert rows["aud-1"]["n_bytes"] == 0  # null payload -> empty feature basis


def test_featurize_deterministic_and_partition_invariant(spark, media):
    a = {r["media_id"]: r["feature"] for r in featurize_media(media).collect()}
    b = {r["media_id"]: r["feature"]
         for r in featurize_media(media.repartition(4)).collect()}
    assert a == b


def test_real_decoder_slot_falls_back(spark, media):
    rows = featurize_media(media, use_real_decoder=True).collect()
    assert all(r["decode_status"] == "stub-fallback" for r in rows)
    # feature values identical to the stub path (same kernel)
    stub = {r["media_id"]: r["feature"] for r in featurize_media(media).collect()}
    real = {r["media_id"]: r["feature"] for r in rows}
    assert stub == real


def test_frame_sample_plan(spark, media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    # only the video row explodes; 4200ms -> frames at 0..3999
    assert {(r["media_id"], r["frame_idx"], r["frame_ts_ms"]) for r in frames} \
        == {("vid-1", i, i * 1000) for i in range(4)}


def test_resize_media_geometry(spark, media):
    from dxnn_ocr_cpp_spark.operators.multimodal import resize_media
    out = {r.media_id: r for r in resize_media(media, max_side=32).collect()}
    assert len(out) == 4
    # 64x48 -> scale 0.5 -> 32x24 (aspect preserved, max side capped)
    assert (out["img-1"].out_width, out["img-1"].out_height) == (32, 24)
    # 32x32 already within cap -> unchanged (never upscale)
    assert (out["img-2"].out_width, out["img-2"].out_height) == (32, 32)
    # 640x360 -> 32x18
    assert (out["vid-1"].out_width, out["vid-1"].out_height) == (32, 18)
    # null dims clamp to 1x1; payload passthrough flagged
    assert (out["aud-1"].out_width, out["aud-1"].out_height) == (1, 1)
    assert all(r.resize_status == "stub-passthrough" for r in out.values())
    assert out["img-1"].payload == ROWS[0][2]


def test_resize_long_side_exact(spark):
    """Rounding regression: 277x277 @ max 224 must give 224, not 223
    (float truncation made ~16% of sizes come out max_side-1)."""
    from dxnn_ocr_cpp_spark.operators.multimodal import resize_media
    rows = [("a", "image", b"x", "image/png", 277, 277, None),
            ("b", "image", b"x", "image/png", 299, 299, None),
            ("c", "image", b"x", "image/png", 314, 158, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: (r.out_width, r.out_height)
           for r in resize_media(df, max_side=224).collect()}
    assert out["a"] == (224, 224)
    assert out["b"] == (224, 224)
    assert out["c"] == (224, 113)  # round(158*224/314) = 113
