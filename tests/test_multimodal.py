"""Multimodal plumbing tests: the binary+metadata contract, Arrow batch
shape, determinism, and payload-shedding schemas (decode itself is a
deterministic stub — no codec libs in the container)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import multimodal as M
from loan_approval_prediction_data_engineering_ml_pipeline_spark.sources.loaders import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media_df(spark):
    docs = load_table(spark, SF, "documents").select("doc_id").limit(50)
    return M.attach_fake_media(docs, width=8, height=8, n_frames=4).cache()


def test_media_schema_contract(media_df):
    fields = dict(media_df.dtypes)
    assert fields["media"] == "binary"
    assert fields["media_meta"].startswith("struct<format:string,width:int,height:int,n_frames:int")
    n = media_df.where(F.length("media") == 8 * 8 * 4).count()
    assert n == media_df.count()


def test_feature_extraction(media_df):
    feats = M.extract_image_features(media_df)
    assert [f.name for f in feats.schema.fields] == ["doc_id", "mean_lum", "std_lum", "n_frames"]
    rows = feats.collect()
    assert len(rows) == 50
    assert all(0.0 <= r["mean_lum"] <= 255.0 for r in rows)
    # determinism: same input -> same features
    again = {r["doc_id"]: r["mean_lum"] for r in M.extract_image_features(media_df).collect()}
    assert {r["doc_id"]: r["mean_lum"] for r in rows} == again


def test_resize_updates_payload_and_meta(media_df):
    small = M.resize_media(media_df, out_w=4, out_h=4)
    r = small.first()
    assert r["media_meta"]["width"] == 4 and r["media_meta"]["height"] == 4
    assert len(r["media"]) == 4 * 4 * 4  # w*h*frames


def test_frame_sampling(media_df):
    frames = M.sample_frames(media_df, every_n=2)
    assert frames.count() == 50 * 2  # 4 frames, every 2nd
    r = frames.first()
    assert len(r["frame"]) == 8 * 8
    assert {x["frame_idx"] for x in frames.select("frame_idx").distinct().collect()} == {0, 2}


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="Pillow present: real path active")
def test_real_decode_raises_clearly_without_pillow():
    """Codec-less environments get a NotImplementedError naming the
    missing dependency, not an opaque ImportError mid-batch."""
    with pytest.raises(NotImplementedError, match="[Pp]illow"):
        M.decode_real(b"")


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_real_decode_round_trips_generated_png():
    """decode_real on a PNG generated from known pixels returns exactly
    those pixels. The PNG is built with stdlib zlib/struct so the test
    exercises PIL's decoder, not PIL's encoder."""
    import struct
    import zlib

    import numpy as np

    h, w = 5, 7
    pixels = (np.arange(h * w, dtype=np.uint8) * 7 % 256).reshape(h, w)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = M.decode_real(png)
    assert got.shape == (h, w)
    assert (got == pixels).all()


def test_extract_audio_features(spark):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.multimodal import (
        attach_fake_media,
        extract_audio_features,
    )

    base = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    media = attach_fake_media(base, width=16, height=16, n_frames=2)
    out = extract_audio_features(media, sample_rate=16_000)
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        # 16*16*2 = 512 bytes -> 256 int16 samples -> 0.016 s
        assert r["duration_sec"] == 256 / 16_000
        assert 0.0 <= r["rms"] <= 1.0
        assert 0.0 <= r["zero_crossing_rate"] <= 1.0
        assert r["rms"] <= r["peak"] <= 1.0
    # deterministic: same media -> same features
    again = {r["doc_id"]: r["rms"] for r in extract_audio_features(media).collect()}
    assert {r["doc_id"]: r["rms"] for r in rows} == again
