"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with typed metadata
columns travelling alongside. The Spark-side plumbing — schema, Arrow batch
shape, partitioning, UDF signatures — is real and tested; the actual decoder
is STUBBED (the codec libraries are not in this container): decode_features
uses a deterministic fake extractor by default and raises
NotImplementedError when ``real=True`` is requested, marking exactly where
a Pillow/ffmpeg-backed kernel plugs in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "asset_id long, n_bytes int, codec string, features array<float>"
)


def binary_metadata(assets: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Typed metadata of an opaque binary column — pure JVM-side ops."""
    return assets.select(
        "asset_id",
        F.length(F.col(bin_col)).alias("n_bytes"),
        F.md5(F.col(bin_col)).alias("content_md5"),
        F.substring(F.col(bin_col), 1, 4).alias("magic"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature extractor: FEATURE_DIM md5 moments
    over byte stripes (feature i = first 32 bits of md5(stripe_i) mod 1e4,
    scaled to [0,1)). md5 rather than crc32 so the exact values are
    reproducible in ANSI SQL (the driver's DuckDB oracle re-derives them).
    Replace with a real decoder (see decode_features)."""
    out = np.zeros(FEATURE_DIM, dtype=np.float32)
    if not payload:
        return out
    stripe = max(1, len(payload) // FEATURE_DIM)
    for i in range(FEATURE_DIM):
        chunk = payload[i * stripe : (i + 1) * stripe]
        h = hashlib.md5(chunk).hexdigest()
        out[i] = (int(h[:8], 16) % 10_000) / 10_000.0
    return out


def decode_features(
    assets: DataFrame, bin_col: str = "payload", real: bool = False
) -> DataFrame:
    """binary assets -> fixed-width feature vectors via mapInPandas.

    ``real=True`` is the integration point for an actual image/audio decoder
    (PIL/torchaudio/ffmpeg): NOT available in this container."""
    if real:
        raise NotImplementedError(
            "real decoders (Pillow/ffmpeg) are not installed in this "
            "environment; wire them here — the Spark plumbing (schema, "
            "batching, partitioning) is already in place"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(x) for x in _fake_decode(bytes(p))] for p in pdf[bin_col]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [len(bytes(p)) for p in pdf[bin_col]],
                    "codec": ["fake-md5/v1"] * len(pdf),
                    "features": feats,
                }
            )

    return assets.select("asset_id", bin_col).mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


RESIZED_SCHEMA = (
    "asset_id long, src_w int, src_h int, dst_w int, dst_h int, "
    "resized binary, resized_md5 string"
)


def resize_assets(
    assets: DataFrame,
    dst_w: int = 64,
    dst_h: int = 64,
    bin_col: str = "payload",
    real: bool = False,
) -> DataFrame:
    """binary image assets -> resized binary + dimension metadata via
    mapInPandas (1:1 Arrow batch shape). The Spark plumbing — schema,
    batching, binary-out column — is real; the decoder/resampler is STUBBED
    (``real=True`` is the Pillow integration point, not available here):
    the fake treats the payload as a row-major byte image with deterministic
    source dims derived from its length, and "resizes" by nearest-neighbor
    byte sampling, so output bytes are deterministic and testable."""
    if real:
        raise NotImplementedError(
            "real image resampling (Pillow) is not installed in this "
            "environment; wire Image.open/resize here — the Spark plumbing "
            "(schema, batching, binary columns) is already in place"
        )
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "asset_id", "src_w", "src_h", "dst_w", "dst_h",
                "resized", "resized_md5",
            )}
            for aid, p in zip(pdf["asset_id"], pdf[bin_col]):
                raw = bytes(p)
                # fake source dims: squarish factorization of the length
                n = max(len(raw), 1)
                src_w = max(1, int(n ** 0.5))
                src_h = max(1, n // src_w)
                img = np.frombuffer(
                    raw[: src_w * src_h].ljust(src_w * src_h, b"\0"),
                    dtype=np.uint8,
                ).reshape(src_h, src_w)
                ys = (np.arange(dst_h) * src_h // dst_h).clip(0, src_h - 1)
                xs = (np.arange(dst_w) * src_w // dst_w).clip(0, src_w - 1)
                resized = img[ys][:, xs].tobytes()
                rows["asset_id"].append(aid)
                rows["src_w"].append(src_w)
                rows["src_h"].append(src_h)
                rows["dst_w"].append(dst_w)
                rows["dst_h"].append(dst_h)
                rows["resized"].append(resized)
                rows["resized_md5"].append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(rows)

    return assets.select("asset_id", bin_col).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: expands each asset into frame-index
    rows (decode stubbed the same way). Shows the 1->N batch shape for frame
    extraction without the codec."""
    return assets.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(every_n - 1))
        ).alias("frame_idx"),
    ).withColumn("sampled", F.col("frame_idx") % F.lit(every_n) == 0)
