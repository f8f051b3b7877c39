"""Multimodal plumbing: binary payload schema, Arrow batch decode,
frame striding."""

from __future__ import annotations

from mirrulations_iceberg_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_SAMPLE_EVERY,
    decode_features,
    media_table,
    mm3_frame_sample,
)

from .conftest import SF_DIR


def test_media_schema(spark):
    media = media_table(spark, SF_DIR)
    cols = dict(media.dtypes)
    assert cols["payload"] == "binary"
    assert cols["meta"].startswith("struct<container:string,declared_bytes:bigint")
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "video", "audio"}


def test_decode_features_batchwise(spark):
    media = media_table(spark, SF_DIR)
    feats = decode_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert r.n_bytes > 0
        assert 0.0 <= r.mean_byte <= 255.0
        assert 0.0 <= r.byte_entropy <= 8.0


def test_payload_bytes_match_declared(spark):
    """octet_length(payload) must equal the typed metadata's
    declared_bytes (ASCII fixture: 1 byte per char)."""
    media = media_table(spark, SF_DIR)
    bad = media.filter("octet_length(payload) <> meta.declared_bytes")
    assert bad.count() == 0


def test_resize_plumbing(spark):
    from mirrulations_iceberg_spark.operators.multimodal import (
        RESIZE_TARGET,
        resize_images,
    )

    media = media_table(spark, SF_DIR)
    thumbs = resize_images(media)
    rows = thumbs.collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(rows) == n_images
    h, w = RESIZE_TARGET
    for r in rows[:20]:
        assert len(r.thumb) == h * w
        assert (r.thumb_h, r.thumb_w) == (h, w)


def test_frame_sampling_stride(spark):
    rows = mm3_frame_sample(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        expected = max(-(-r.n_frames // FRAME_SAMPLE_EVERY), 1)
        assert r.n_sampled == expected
        assert r.n_distinct_frames <= r.n_sampled
