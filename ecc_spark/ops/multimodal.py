"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is REAL — schema (ecc_spark.schemas.MEDIA),
host-salted partitioning of fat binary rows, Arrow batch shape, and
mapInPandas decode/feature/resize/frame-sample stages. The codecs are
NOT: this container has no image/audio libraries, so decode is a
DeterministicFakeCodec (bytes → stable pseudo-pixels) with the real-codec
call sites marked NotImplementedError. Swapping in PIL/ffmpeg changes
only `_decode_payload`.

Driver-contract entry `multimodal_features` is ◦ (rows-only): binary
payloads have no DuckDB-oracle representation worth faking.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_REAL_CODECS = False  # flip when PIL / soundfile / av are installed


def synth_media(spark: SparkSession, n: int = 200, seed: int = 13) -> DataFrame:
    """Deterministic media table: payload bytes derived from media_ref."""
    rows = []
    for i in range(n):
        ref = f"Image_{i % 30}.png" if i % 3 else f"Clip_{i % 20}.mp4"
        kind = "video" if ref.endswith(".mp4") else "image"
        h = zlib.crc32(f"{seed}:{ref}:{i}".encode())
        payload = (h.to_bytes(4, "little") * (64 + h % 64))[: 256 + h % 256]
        rows.append(
            {
                "media_ref": f"{i}/{ref}",
                "kind": kind,
                "payload": payload,
                "width": 16 + h % 48 if kind == "image" else None,
                "height": 16 + (h >> 8) % 48 if kind == "image" else None,
                "duration_ms": 1000 + h % 9000 if kind == "video" else None,
            }
        )
    from ecc_spark.schemas import MEDIA

    return spark.createDataFrame(rows, schema=MEDIA)


def _decode_payload(payload: bytes, kind: str, width: int | None, height: int | None) -> np.ndarray:
    """Deterministic fake decode: payload bytes → (h, w) uint8 'pixels'.

    REAL implementation would be:
        if kind == 'image': np.asarray(PIL.Image.open(io.BytesIO(payload)))
        if kind == 'video': av.open(...) frame iterator
    """
    if _REAL_CODECS:
        # the real decode path is NOT implemented — this raise marks the
        # call site to fill in (PIL.Image.open / av.open) when the flag
        # is flipped after installing the libraries
        raise NotImplementedError("wire PIL/av decode here before setting _REAL_CODECS")
    # nullable int columns arrive through Arrow→pandas as NaN floats
    w = 16 if width is None or width != width else int(width)
    h = 16 if height is None or height != height else int(height)
    raw = np.frombuffer(payload, dtype=np.uint8)
    reps = (w * h + len(raw) - 1) // len(raw)
    return np.tile(raw, reps)[: w * h].reshape(h, w)


def decode_features(media: DataFrame, resize_to: int = 8) -> DataFrame:
    """media → per-item feature rows via mapInPandas: decode → resize
    (stride subsample) → mean/std/edge-energy features. Binary rows are
    fat: repartition by a hash salt so no executor holds a skewed slice."""
    out_schema = (
        "media_ref string, kind string, n_bytes int, "
        "mean double, std double, edge_energy double, thumb array<int>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                px = _decode_payload(r.payload, r.kind, r.width, r.height)
                stride = max(1, min(px.shape) // resize_to)
                thumb = px[::stride, ::stride][:resize_to, :resize_to]
                dx = np.abs(np.diff(px.astype(np.int32), axis=1)).mean() if px.shape[1] > 1 else 0.0
                rows.append(
                    {
                        "media_ref": r.media_ref,
                        "kind": r.kind,
                        "n_bytes": len(r.payload),
                        "mean": float(px.mean()),
                        "std": float(px.std()),
                        "edge_energy": float(dx),
                        "thumb": thumb.flatten().astype(int).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    salted = media.repartition(F.pmod(F.xxhash64("media_ref"), F.lit(32)))
    return salted.mapInPandas(batches, schema=out_schema)


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled timestamp.
    Frame decode itself is the fake codec; the explode shape is real."""
    vids = media.filter(F.col("kind") == "video")
    stamps = F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
    return vids.select(
        "media_ref", F.explode(stamps).alias("ts_ms"), F.length("payload").alias("n_bytes")
    )


def multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    n = 600 if "0.1" in sf and "0.01" not in sf else 200
    media = synth_media(spark, n=n)
    return decode_features(media).drop("thumb")


def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    media = synth_media(spark, n=200)
    return frame_sample(media)


QUERIES.update(
    {
        "multimodal_features": multimodal_features,
        "multimodal_frame_sample": multimodal_frame_sample,
    }
)
