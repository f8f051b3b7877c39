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


def test_documents_text_is_ascii(spark):
    """Guard the byte-vs-char parity assumption mm5/mm6 depend on
    (ADVICE r13): the Spark side hashes UTF-8 payload BYTES while the
    DuckDB oracles use character ops (LENGTH/ord(substr)); the two
    agree only while documents.text is pure 1-byte ASCII. If a future
    fixture adds non-ASCII text this fails LOUDLY here instead of as
    an opaque oracle hash-mismatch."""
    from pyspark.sql import functions as F

    from mirrulations_iceberg_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    non_ascii = docs.filter(
        F.octet_length("text") != F.length("text")
    ).count()
    assert non_ascii == 0, (
        f"{non_ascii} documents have non-ASCII text; mm5/mm6 oracles "
        "(char-indexed) no longer match the Spark byte-indexed hash — "
        "switch the oracles to octet arithmetic before re-enabling."
    )


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


def test_thumb_batch_without_pil():
    """PIL absent: deterministic strided sample, exact output size."""
    from mirrulations_iceberg_spark.operators import multimodal as mm

    h, w = mm.RESIZE_TARGET
    thumbs = mm._thumb_batch([b"", b"x", b"hello world" * 40])
    assert [len(t) for t in thumbs] == [h * w] * 3
    assert thumbs == mm._thumb_batch([b"", b"x", b"hello world" * 40])


def test_thumb_batch_with_pil(monkeypatch):
    """PIL present: decodable payloads take the real decode path;
    undecodable ones fall back to the strided sample — driven with a
    fake PIL so the branch is covered in this PIL-less container."""
    import sys
    import types

    from mirrulations_iceberg_spark.operators import multimodal as mm

    h, w = mm.RESIZE_TARGET

    class _FakeImg:
        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, size):
            assert size == (w, h)
            return self

        def tobytes(self):
            return bytes(range(h * w % 256)) + bytes(h * w - (h * w % 256))

    def _open(buf):
        if buf.read(4) == b"IMG!":
            return _FakeImg()
        raise OSError("cannot identify image file")

    fake_image = types.SimpleNamespace(open=_open)
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)
    monkeypatch.setattr(mm, "HAVE_IMAGE_LIBS", True)

    decodable = b"IMG!" + bytes(100)
    raw = b"not an image payload"
    thumbs = mm._thumb_batch([decodable, raw])
    assert thumbs[0] == _FakeImg().tobytes()
    assert thumbs[1] == mm._strided_thumbnail(raw, h * w)
    assert all(len(t) == h * w for t in thumbs)


def test_frame_sampling_stride(spark):
    rows = mm3_frame_sample(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        expected = max(-(-r.n_frames // FRAME_SAMPLE_EVERY), 1)
        assert r.n_sampled == expected
        assert r.n_distinct_frames <= r.n_sampled
