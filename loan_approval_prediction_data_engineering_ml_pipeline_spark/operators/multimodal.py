"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step runs on a deterministic fake (bytes → pseudo-pixel
grid) in codec-less environments like this container; the real decoder
(:func:`decode_real`) is wired to PIL behind an optional import and
round-trip tested when Pillow is present. The Spark-side contract that
matters at 100 TB is real and tested either way:

- schema: ``media binary`` + ``media_meta struct<format,width,height,
  n_frames>`` travels through shuffles/projections untouched;
- mapInPandas processes *partition-sized Arrow batches*, so per-row
  Python overhead is amortized and memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- decode → feature-extract → resize → frame-sample compose as ordinary
  DataFrame transforms and partitioning/pushdown still apply (the binary
  column is pruned away when untouched).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_fake_media(
    df: DataFrame, *, id_col: str = "doc_id", width: int = 8, height: int = 8, n_frames: int = 4
) -> DataFrame:
    """Deterministically synthesize a binary media column from the id —
    stands in for reading real image/video bytes from object storage."""
    seed = F.md5(F.col(id_col).cast("string"))
    frame = F.repeat(F.unbase64(F.base64(F.encode(seed, "utf-8"))), (width * height * n_frames) // 32 + 1)
    return df.withColumn(
        "media", F.substring(frame, 1, width * height * n_frames).cast("binary")
    ).withColumn(
        "media_meta",
        F.struct(
            F.lit("fake-gray8").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(n_frames).alias("n_frames"),
        ),
    )


def _decode_gray8(buf: bytes, width: int, height: int, n_frames: int) -> np.ndarray:
    """STUB decoder: interpret bytes as (n_frames, h, w) uint8 'pixels'.

    Real decode (PIL/ffmpeg) is intentionally NOT implemented in this
    container — swap this function for the codec call in production."""
    need = width * height * n_frames
    arr = np.frombuffer(buf[:need].ljust(need, b"\0"), dtype=np.uint8)
    return arr.reshape(n_frames, height, width)


def decode_real(buf: bytes) -> np.ndarray:
    """Real image decode via PIL (public codec, optional import): encoded
    bytes (PNG/JPEG/…) → numpy array (H, W) or (H, W, C). This is the
    production swap-in for :func:`_decode_gray8`; the import is deferred
    so environments without Pillow (this container) keep the full
    Spark-side contract working on the deterministic fake and raise a
    clear NotImplementedError only if the real path is actually called.
    Round-trip tested (generated PNG → decode → pixel equality) when PIL
    is importable; skip-marked otherwise."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - container has no Pillow
        raise NotImplementedError(
            "real image decode needs Pillow (`pip install pillow`); this "
            "environment has no codec libraries, so use the deterministic "
            "fake decoder (_decode_gray8) for plumbing tests"
        ) from exc
    import io

    with Image.open(io.BytesIO(buf)) as img:
        return np.asarray(img)


def extract_image_features(df: DataFrame) -> DataFrame:
    """decode → per-frame luminance stats, as an Arrow-batched mapInPandas.

    Output schema drops the binary payload (feature extraction is exactly
    the place the pipeline sheds bytes — never carry media past decode)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("mean_lum", T.DoubleType()),
            T.StructField("std_lum", T.DoubleType()),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                m = r["media_meta"]
                grid = _decode_gray8(bytes(r["media"]), m["width"], m["height"], m["n_frames"])
                rows.append(
                    (int(r["doc_id"]), float(grid.mean()), float(grid.std()), int(m["n_frames"]))
                )
            yield pd.DataFrame(rows, columns=["doc_id", "mean_lum", "std_lum", "n_frames"])

    return df.select("doc_id", "media", "media_meta").mapInPandas(batches, out_schema)


def resize_media(df: DataFrame, *, out_w: int, out_h: int) -> DataFrame:
    """decode → nearest-neighbor resize → re-encode bytes; metadata updated.
    Shows a transform that rewrites the payload while keeping the column
    contract (binary + struct) intact."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                m = r["media_meta"]
                grid = _decode_gray8(bytes(r["media"]), m["width"], m["height"], m["n_frames"])
                yi = (np.arange(out_h) * m["height"] // out_h)
                xi = (np.arange(out_w) * m["width"] // out_w)
                small = grid[:, yi][:, :, xi]
                rows.append(
                    (
                        int(r["doc_id"]),
                        small.tobytes(),
                        {"format": "fake-gray8", "width": out_w, "height": out_h,
                         "n_frames": int(m["n_frames"])},
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media", "media_meta"])

    return df.select("doc_id", "media", "media_meta").mapInPandas(batches, out_schema)


def extract_audio_features(df: DataFrame, *, sample_rate: int = 16_000) -> DataFrame:
    """Audio path of the multimodal contract: binary payload interpreted
    as int16 PCM mono (the STUB stand-in for a real libsndfile/ffmpeg
    decode), reduced to duration / RMS / zero-crossing-rate — the
    waveform-level stats an audio curation pipeline filters on (silence,
    clipping, junk). Same Arrow-batched mapInPandas contract as the
    image/video paths; numpy-vectorized per clip."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("duration_sec", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossing_rate", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                buf = bytes(r["media"])
                wave = np.frombuffer(buf[: len(buf) - (len(buf) % 2)], dtype=np.int16)
                if len(wave) == 0:
                    rows.append((int(r["doc_id"]), 0.0, 0.0, 0.0, 0.0))
                    continue
                x = wave.astype(np.float64) / 32768.0
                zc = float(np.mean(np.abs(np.diff(np.signbit(x))).astype(np.float64))) if len(x) > 1 else 0.0
                rows.append(
                    (
                        int(r["doc_id"]),
                        float(len(x) / sample_rate),
                        float(np.sqrt(np.mean(x * x))),
                        zc,
                        float(np.max(np.abs(x))),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "duration_sec", "rms", "zero_crossing_rate", "peak"],
            )

    return df.select("doc_id", "media").mapInPandas(batches, out_schema)


def sample_frames(df: DataFrame, *, every_n: int = 2) -> DataFrame:
    """Frame sampling: explode each video's frames, keep every n-th.
    One output row per kept frame (doc_id, frame_idx, frame bytes)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                m = r["media_meta"]
                grid = _decode_gray8(bytes(r["media"]), m["width"], m["height"], m["n_frames"])
                for i in range(0, int(m["n_frames"]), every_n):
                    rows.append((int(r["doc_id"]), i, grid[i].tobytes()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.select("doc_id", "media", "media_meta").mapInPandas(batches, out_schema)
