"""Multimodal (image/audio/video) column plumbing (B76).

Media are opaque ``binary`` columns + a typed metadata struct; the
Spark-side machinery — binaryFile ingest, schema, partition-friendly
batch transforms via ``mapInPandas`` — is real and tested. Codec
tiers, by dependency weight:

1. ``operators/imagecodec.py`` (DEFAULT since round 6): pure
   numpy+zlib PNG/BMP decode + nearest-neighbor resize — real pixels
   in every environment, no media libraries needed.
2. Pillow (``pil_image_decoder`` / ``pil_image_resizer``), env-gated:
   richer formats (JPEG, WebP, TIFF) and smoother resampling.
3. ``decoder=`` / ``resizer=`` injection for production codecs
   (ffmpeg, torchaudio, nvJPEG …) — same contract, same plumbing.

The deterministic fakes below remain for tests of the injection
plumbing itself.

At 100 TB: binary payloads never pass through a shuffle — transforms
are narrow ``mapInPandas`` stages; only extracted features (small,
typed) continue into joins/aggregations.
"""

from __future__ import annotations

import zlib
from typing import Callable, Iterator

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from shredder_spark.utils import ensure_package_on_executors

MEDIA_META_DDL = "path string, media_type string, n_bytes long, checksum long"


def read_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Ingest a directory of media files as (path, content, meta)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.col("path"),
        F.col("content"),
        F.struct(
            F.col("path"),
            F.element_at(F.split(F.col("path"), r"\."), -1).alias("media_type"),
            F.col("length").alias("n_bytes"),
            F.crc32(F.col("content")).alias("checksum"),
        ).alias("meta"),
    )


def fake_image_decoder(content: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives a stable
    pseudo width/height/mean from the bytes. Replace with a real
    decoder in production."""
    crc = zlib.crc32(content)
    return {
        "width": 64 + crc % 512,
        "height": 64 + (crc >> 9) % 512,
        "mean_luma": float((crc >> 18) % 256),
    }


def unavailable_decoder(content: bytes) -> dict:
    raise NotImplementedError(
        "media codecs not available in this environment; inject a real "
        "decoder (PIL / torchaudio / pyav) via decoder=")


def pil_available() -> bool:
    """True when Pillow is importable — gate for the real codec path."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def pil_image_decoder(content: bytes) -> dict:
    """Real image decode via Pillow: width/height/mean grayscale luma.
    Same output contract as :func:`fake_image_decoder`, so swapping
    ``decoder=pil_image_decoder`` is the only production change. Use
    :func:`pil_available` to gate; the import happens inside the UDF
    so executors resolve it from their own environment."""
    import io

    from PIL import Image, ImageStat

    with Image.open(io.BytesIO(content)) as im:
        stat = ImageStat.Stat(im.convert("L"))
        return {
            "width": im.width,
            "height": im.height,
            "mean_luma": float(stat.mean[0]),
        }


def pil_image_resizer(content: bytes, width: int, height: int) -> bytes:
    """Real resize via Pillow, re-encoded in the source format (PNG
    fallback). Same contract as :func:`fake_resizer`."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(content)) as im:
        fmt = im.format or "PNG"
        buf = io.BytesIO()
        im.resize((width, height)).save(buf, format=fmt)
        return buf.getvalue()


def extract_image_features(
    df: DataFrame,
    *,
    decoder: Callable[[bytes], dict] | None = None,
    content_col: str = "content",
) -> DataFrame:
    """Batchwise feature extraction over binary payloads (mapInPandas:
    Arrow batches in, small typed rows out — payload dropped here).
    Default decoder is the REAL pure-Python PNG/BMP codec
    (``imagecodec.image_decoder``; Pillow fallback for other
    formats)."""
    if decoder is None:
        from shredder_spark.operators.imagecodec import image_decoder
        decoder = image_decoder
    ensure_package_on_executors(df.sparkSession)
    out_ddl = "path string, width long, height long, mean_luma double"
    cols = df.select("path", content_col)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(b)) for b in pdf[content_col]]
            yield pd.DataFrame({
                "path": pdf["path"],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "mean_luma": [f["mean_luma"] for f in feats],
            })

    return cols.mapInPandas(_extract, out_ddl)


def fake_resizer(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: emits a payload whose
    size scales with the target box (truncate/tile the source bytes).
    Replace with a real codec-backed resizer in production."""
    target = max(1, (width * height) // 64)
    reps = (target // max(len(content), 1)) + 1
    return (content * reps)[:target]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    *,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    content_col: str = "content",
) -> DataFrame:
    """Payload→payload resize as a narrow ``mapInPandas`` stage: binary
    in, binary out, no shuffle; metadata is recomputed for the new
    payload. The batch shape (Arrow binary columns both ways) is the
    production plumbing; the default pixel work is the REAL pure
    PNG/BMP nearest-neighbor tier (``imagecodec.image_resizer``)."""
    if resizer is None:
        from shredder_spark.operators.imagecodec import image_resizer
        resizer = image_resizer
    ensure_package_on_executors(df.sparkSession)
    out_ddl = "path string, content binary, width long, height long"
    cols = df.select("path", content_col)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resizer(bytes(b), width, height) for b in pdf[content_col]]
            yield pd.DataFrame({
                "path": pdf["path"],
                "content": resized,
                "width": [width] * len(resized),
                "height": [height] * len(resized),
            })

    out = cols.mapInPandas(_resize, out_ddl)
    return out.select(
        "path", "content",
        F.struct(
            F.col("path"), F.lit("resized").alias("media_type"),
            F.length("content").cast("long").alias("n_bytes"),
            F.crc32("content").alias("checksum"),
            F.col("width"), F.col("height"),
        ).alias("meta"),
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: explode frame indices from
    metadata without decoding (the decode itself is the injected stub).
    Demonstrates the fan-out schema (one row per sampled frame)."""
    return df.select(
        "path",
        F.explode(F.sequence(F.lit(0), F.lit(every_n - 1))).alias("frame_idx"),
    )
