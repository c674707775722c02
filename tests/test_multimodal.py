"""Multimodal plumbing tests: the binary+metadata contract, Arrow batch
shape, determinism, payload-shedding schemas, and the real PNG decode
path (PIL when present, stdlib zlib fallback otherwise — the round-trip
tests run in every environment, codec libs or not)."""

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
def test_real_decode_raises_clearly_on_non_png_without_pillow():
    """Codec-less environments get a NotImplementedError naming the
    missing dependency for non-PNG bytes, not an opaque ImportError
    mid-batch; PNG bytes decode via the stdlib fallback regardless."""
    with pytest.raises(NotImplementedError, match="[Pp]illow"):
        M.decode_real(b"\xff\xd8\xff\xe0 not-a-png")


def _make_png(pixels, *, color_type: int, filters=None) -> bytes:
    """Minimal stdlib PNG *encoder* for test fixtures, with per-row
    filter-type control so the decoder's unfilter paths (None/Sub/Up/
    Average/Paeth) are each exercised. Inverse-filters per the spec."""
    import struct
    import zlib

    import numpy as np

    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w = pixels.shape[0], pixels.shape[1]
    nchan = 1 if pixels.ndim == 2 else pixels.shape[2]
    flat = pixels.reshape(h, w * nchan).astype(np.int32)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * nchan, dtype=np.int32)
    for y in range(h):
        f = filters[y]
        line = flat[y]
        enc = line.copy()
        for i in range(w * nchan):
            a = int(line[i - nchan]) if i >= nchan else 0
            b = int(prev[i])
            c = int(prev[i - nchan]) if i >= nchan else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[i] = (int(line[i]) - pred) & 0xFF
        raw += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = line

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_real_decode_round_trips_generated_png():
    """decode_real on a PNG generated from known pixels returns exactly
    those pixels — runs in EVERY environment: PIL's decoder when
    installed, the stdlib PNG fallback otherwise (the PNG is built with
    stdlib zlib/struct either way, so the test always exercises a
    decoder against an independent encoder)."""
    import numpy as np

    h, w = 5, 7
    pixels = (np.arange(h * w, dtype=np.uint8) * 7 % 256).reshape(h, w)
    got = M.decode_real(_make_png(pixels, color_type=0))
    assert got.shape == (h, w)
    assert (got == pixels).all()


def test_real_decode_rgb_all_filter_types():
    """An RGB PNG whose five rows use filters None/Sub/Up/Average/Paeth
    decodes back to the exact source pixels (covers every unfilter
    branch, including the left-neighbor bpp offset on multi-channel)."""
    import numpy as np

    rng = np.random.default_rng(42)
    pixels = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    got = M.decode_real(_make_png(pixels, color_type=2, filters=[0, 1, 2, 3, 4]))
    assert got.shape == (5, 6, 3)
    assert (got == pixels).all()


def test_real_decode_rgba_paeth_only():
    """RGBA with Paeth on every row — the filter PIL's encoder favors."""
    import numpy as np

    rng = np.random.default_rng(7)
    pixels = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    got = M.decode_real(_make_png(pixels, color_type=6, filters=[4] * 4))
    assert (got == pixels).all()


def test_png_payloads_flow_through_spark_feature_extraction(spark):
    """End-to-end REAL-codec path through the Spark operator: rows carry
    actual PNG-encoded bytes (stdlib encoder), ``media_meta.format='png'``
    dispatches :func:`decode_real` inside the mapInPandas batch, and the
    luminance features match numpy computed on the source pixels."""
    import numpy as np

    rng = np.random.default_rng(11)
    imgs = {i: rng.integers(0, 256, size=(6, 5), dtype=np.uint8) for i in range(4)}
    rows = [
        (
            i,
            bytearray(M.encode_png(px)),
            {"format": "png", "width": 5, "height": 6, "n_frames": 1},
        )
        for i, px in imgs.items()
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
                T.StructField("media_meta", M.MEDIA_META),
            ]
        ),
    )
    feats = {r["doc_id"]: r for r in M.extract_image_features(df).collect()}
    for i, px in imgs.items():
        assert feats[i]["mean_lum"] == pytest.approx(float(px.mean()))
        assert feats[i]["std_lum"] == pytest.approx(float(px.std()))
        assert feats[i]["n_frames"] == 1


def test_resize_png_payload_reencodes_as_png(spark):
    """Resizing a real PNG payload yields a decodable PNG of the target
    geometry whose pixels are the nearest-neighbor downsample."""
    import numpy as np

    px = (np.arange(8 * 8, dtype=np.uint8) * 3 % 256).reshape(8, 8)
    df = spark.createDataFrame(
        [(1, bytearray(M.encode_png(px)), {"format": "png", "width": 8, "height": 8, "n_frames": 1})],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
                T.StructField("media_meta", M.MEDIA_META),
            ]
        ),
    )
    r = M.resize_media(df, out_w=4, out_h=4).first()
    assert r["media_meta"]["format"] == "png"
    got = M.decode_real(bytes(r["media"]))
    yi = np.arange(4) * 8 // 4
    assert got.shape == (4, 4)
    assert (got == px[yi][:, yi]).all()


def test_resize_preserves_color_channels(spark):
    """Resizing a COLOR PNG keeps RGB (no silent luminance collapse —
    ADVICE r5): output decodes to (h, w, 3) and every pixel is the
    nearest-neighbor pick of the source, channels intact."""
    import numpy as np

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(M.encode_png(px)), {"format": "png", "width": 8, "height": 8, "n_frames": 1})],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
                T.StructField("media_meta", M.MEDIA_META),
            ]
        ),
    )
    r = M.resize_media(df, out_w=4, out_h=4).first()
    got = M.decode_real(bytes(r["media"]))
    yi = np.arange(4) * 8 // 4
    assert got.shape == (4, 4, 3)
    assert (got == px[yi][:, yi]).all()
    # RGBA survives too, alpha included
    pxa = rng.integers(0, 256, size=(6, 6, 4), dtype=np.uint8)
    dfa = spark.createDataFrame(
        [(2, bytearray(M.encode_png(pxa)), {"format": "png", "width": 6, "height": 6, "n_frames": 1})],
        df.schema,
    )
    ra = M.resize_media(dfa, out_w=3, out_h=3).first()
    gota = M.decode_real(bytes(ra["media"]))
    ya = np.arange(3) * 6 // 3
    assert gota.shape == (3, 3, 4)
    assert (gota == pxa[ya][:, ya]).all()


def test_encode_png_decode_real_inverse_rgb():
    """encode_png → decode_real is the identity on RGB uint8 pixels."""
    import numpy as np

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(9, 4, 3), dtype=np.uint8)
    assert (M.decode_real(M.encode_png(px)) == px).all()


def test_stdlib_png_rejects_unsupported_geometry():
    """16-bit / interlaced PNGs fail loudly with the Pillow pointer, not
    with garbage pixels (stdlib fallback path only)."""
    if _pil_available():
        pytest.skip("Pillow decodes these for real")
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    png16 = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="[Pp]illow"):
        M.decode_real(png16)


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


def _png_media_df(spark, rows):
    """(doc_id, pixels) -> a real-PNG media frame via the stdlib encoder."""
    data = [
        (
            did,
            M.encode_png(px),
            {"format": "png", "width": px.shape[1], "height": px.shape[0], "n_frames": 1},
        )
        for did, px in rows
    ]
    return spark.createDataFrame(
        data,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
                T.StructField("media_meta", M.MEDIA_META),
            ]
        ),
    )


def test_perceptual_hash_recall_identical_and_perturbed_pngs(spark):
    """The multimodal near-dup pipeline over REAL PNG bytes: an exact
    re-encode hashes identically (hamming 0), a lightly-perturbed copy
    (a few pixels nudged) lands within the hamming threshold, and a
    structurally different image does NOT pair — for both aHash and
    dHash, end to end through decode -> hash -> banding -> pairs."""
    import numpy as np

    base = (
        (np.arange(64)[:, None] * 29 + np.arange(64)[None, :] * 113) % 241
    ).astype(np.uint8)
    identical = base.copy()
    perturbed = base.copy()
    perturbed[0:8, 0:8] = 255  # one saturated 8x8 corner patch
    different = (
        (np.add.outer(np.arange(64), np.arange(64)) // 8) % 2 * 200
    ).astype(np.uint8)  # checkerboard: ~30+ bits from base on both hashes

    df = _png_media_df(
        spark, [(1, base), (2, identical), (3, perturbed), (4, different)]
    )
    for method in ("ahash", "dhash"):
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in M.image_near_dups(
                df, method=method, max_hamming=3, n_bands=4
            ).collect()
        }
        assert pairs[(1, 2)] == 0, (method, pairs)  # identical re-encode
        # the patch edit moves the hash but stays within the threshold
        assert 1 <= pairs[(1, 3)] <= 3, (method, pairs)
        assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs, (
            method, pairs,
        )  # structural difference never pairs


def test_hamming_banding_guarantee_and_guards(spark):
    """Pigeonhole recall: ANY pair within max_hamming shares a band, so
    the bucket join loses nothing vs brute force on a synthetic hash
    set; max_hamming >= n_bands is rejected (the guarantee would not
    hold)."""
    import itertools

    hashes = [0, 1, 3, 7, 1 << 40, (1 << 40) | (1 << 20), -1, -2, 123456789]
    df = spark.createDataFrame([(i, h) for i, h in enumerate(hashes)], "doc_id long, phash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in M.hamming_near_dup_pairs(df, max_hamming=3, n_bands=4).collect()
    }
    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(hashes), 2):
        d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
        if d <= 3:
            want[(i, j)] = d
    assert got == want
    with pytest.raises(ValueError, match="pigeonhole"):
        M.hamming_near_dup_pairs(df, max_hamming=4, n_bands=4)


def test_image_near_dup_plan_no_cartesian(spark):
    import contextlib
    import io

    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import (
        QUERIES,
    )

    df = QUERIES["image_near_dup_pairs"].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()


def test_audio_perceptual_hash_recall_identical_and_perturbed_clips(spark):
    """The audio near-dup pipeline over real int16 PCM: an exact copy
    hashes identically, a lightly boosted 100-sample segment lands
    within the hamming threshold, and a different waveform never pairs
    — end to end through decode -> energy-envelope hash -> banding."""
    import numpy as np

    t = np.arange(16000)
    base = (3000 * np.sin(t / 50.0) + 1500 * np.sin(t / 13.0)).astype(np.int16)
    identical = base.copy()
    perturbed = base.copy()
    perturbed[2000:2100] = (
        (perturbed[2000:2100].astype(float) * 1.5).clip(-32768, 32767).astype(np.int16)
    )
    different = (2500 * np.sin(t / 7.0) * np.exp(-t / 8000.0)).astype(np.int16)

    df = spark.createDataFrame(
        [
            (1, base.tobytes()),
            (2, identical.tobytes()),
            (3, perturbed.tobytes()),
            (4, different.tobytes()),
        ],
        "doc_id long, media binary",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in M.audio_near_dups(df, max_hamming=3, n_bands=4).collect()
    }
    assert pairs[(1, 2)] == 0, pairs
    assert 1 <= pairs[(1, 3)] <= 3, pairs
    assert all(4 not in p for p in pairs), pairs


def test_audio_hash_short_and_odd_payloads(spark):
    """Degenerate clips: shorter than n_windows hashes to 0 (never
    pairs spuriously with real clips unless they are also silent);
    odd-length byte payloads drop the trailing byte like the feature
    extractor does."""
    import numpy as np

    short = np.arange(10, dtype=np.int16)
    odd = np.arange(200, dtype=np.int16)
    df = spark.createDataFrame(
        [(1, short.tobytes()), (2, odd.tobytes() + b"\x01")],
        "doc_id long, media binary",
    )
    rows = {r["doc_id"]: r["phash"] for r in M.audio_perceptual_hash(df).collect()}
    assert rows[1] == 0
    assert isinstance(rows[2], int)


def test_pillow_jpeg_ahash_within_hamming3_of_png_twin(spark):
    """Optional REAL-codec integration (VERDICT r13 #6): with Pillow
    installed, a JPEG re-encode of the same pixels must perceptual-hash
    within Hamming distance 3 of its lossless PNG twin — the property
    the near-dup pipeline depends on when payloads arrive in mixed
    formats. Skips cleanly in codec-less environments (this container);
    green wherever `pip install pillow` ran."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    # smooth low-frequency gradient — the JPEG-friendly content class
    # where lossy re-encoding must NOT move the perceptual hash
    y, x = np.mgrid[0:64, 0:64]
    px = ((x * 2 + y) % 256).astype(np.uint8)
    png_bytes = M.encode_png(px)
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, "JPEG", quality=90)
    rows = [
        (0, bytearray(png_bytes), {"format": "png", "width": 64, "height": 64, "n_frames": 1}),
        (1, bytearray(buf.getvalue()), {"format": "jpeg", "width": 64, "height": 64, "n_frames": 1}),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", T.BinaryType()),
                T.StructField("media_meta", M.MEDIA_META),
            ]
        ),
    )
    hashes = {r["doc_id"]: r["phash"] for r in M.perceptual_hash(df).collect()}
    assert bin(hashes[0] ^ hashes[1]).count("1") <= 3
    # and the decode itself round-trips: Pillow reads back the exact
    # pixels the stdlib encoder wrote
    assert (M.decode_real(png_bytes) == px).all()


def test_video_hash_equals_sample_frames_composition(spark, media_df):
    """The fused video signature (one Arrow decode pass) must equal the
    explicit composition it optimizes: sample_frames -> per-frame
    media rows -> perceptual_hash -> bitwise majority (ties set)."""
    fused = {
        r["doc_id"]: r["phash"]
        for r in M.video_perceptual_hash(media_df, every_n=2).collect()
    }
    frames = M.sample_frames(media_df, every_n=2)
    frame_media = frames.select(
        (F.col("doc_id") * 1000 + F.col("frame_idx")).alias("doc_id"),
        F.col("frame").alias("media"),
        F.expr(
            "named_struct('format', 'fake-gray8', 'width', 8, 'height', 8,"
            " 'n_frames', 1)"
        ).alias("media_meta"),
    )
    per_frame = M.perceptual_hash(frame_media, method="ahash").collect()
    votes: dict[int, list[int]] = {}
    for r in per_frame:
        votes.setdefault(r["doc_id"] // 1000, []).append(r["phash"])
    composed = {}
    for doc, hs in votes.items():
        bits = 0
        for b in range(64):
            cnt = sum((h >> b) & 1 for h in hs)
            if 2 * cnt >= len(hs):
                bits |= 1 << b
        # reinterpret as signed int64 like the operator does
        composed[doc] = bits - (1 << 64) if bits >= (1 << 63) else bits
    assert fused == composed


def test_video_near_dup_planted_family_recall(spark):
    """Planted-family recall for the video pipeline: every returned
    pair is same-family, and nearly all planted variant pairs are
    recovered at hamming <= 3 (per-frame single-pixel edits)."""
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import (
        QUERIES,
    )

    pairs = {
        (r["id_a"], r["id_b"])
        for r in QUERIES["video_near_dup_pairs"].fn(spark, SF).collect()
    }
    assert pairs, "no near-dup pairs found"
    assert all(a % 100 == b % 100 for a, b in pairs)
    planted = {
        (f + 100 * i, f + 100 * j)
        for f in range(100)
        for i in range(3)
        for j in range(i + 1, 3)
    }
    recall = len(pairs & planted) / len(planted)
    assert recall >= 0.9, recall


def test_video_near_dup_plan_no_cartesian(spark):
    from loan_approval_prediction_data_engineering_ml_pipeline_spark.plans.registry import (
        QUERIES,
    )

    plan = QUERIES["video_near_dup_pairs"].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
