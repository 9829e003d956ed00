"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The reference's image loaders (data/functions.py:33-193 — decode,
min-size validation, lazy per-page PDF render) map to binary-payload
columns processed in Arrow batches. The actual codec step is STUBBED
(no image/audio libraries in this container): ``use_stub=False`` raises
``NotImplementedError`` with the real-integration note; ``use_stub=True``
substitutes a deterministic fake (blake2b-derived features), while the
Spark-side plumbing — schema, batch shape, metadata validation,
partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 8
MIN_SIDE = 32  # reference: constants.py:6-7 MIN_IMAGE_SIZE
WARNING_SIDE = 720  # reference: constants.py:7 WARNING_IMAGE_SIZE


def synthetic_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids.tolist():
                h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
                kind = ["image", "audio", "video"][i % 3]
                payload = h * (4 + i % 7)
                meta = {
                    "width": 16 + (i * 37) % 2000 if kind != "audio" else None,
                    "height": 16 + (i * 53) % 1200 if kind != "audio" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": 1 + (i % 300) if kind == "video" else None,
                }
                rows.append((i, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def validate_media(df: DataFrame) -> DataFrame:
    """Metadata validation as column expressions (reference analog:
    min-size 32 hard floor / sub-720 warning, data/functions.py:19-31)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    return df.withColumn(
        "valid",
        F.when(F.col("kind") == "audio", F.col("meta.sample_rate") > 0).otherwise(
            (w >= MIN_SIDE) & (h >= MIN_SIDE)
        ),
    ).withColumn(
        "low_res_warning",
        (F.col("kind") != "audio") & (F.least(w, h) < WARNING_SIDE),
    )


def extract_features(df: DataFrame, use_stub: bool = True) -> DataFrame:
    """Decode + featurize media payloads in Arrow batches.

    Real decode is NOT available in this environment — with
    ``use_stub=False`` this raises NotImplementedError (integration
    point: PIL/torchvision for images, soundfile/torchaudio for audio).
    The stub derives a deterministic FEATURE_DIM-float vector from the
    payload bytes so downstream plumbing (schema, similarity joins,
    partitioning) is exercised end-to-end."""
    if not use_stub:
        raise NotImplementedError(
            "real media decode requires image/audio codecs (PIL / soundfile) "
            "not present in this container; pass use_stub=True for the "
            "deterministic fake-feature path"
        )

    def feats(batches):
        for pdf in batches:
            out_feats = []
            for payload in pdf["payload"].tolist():
                h = hashlib.blake2b(bytes(payload or b""), digest_size=FEATURE_DIM * 4).digest()
                v = np.frombuffer(h, dtype=np.uint32).astype(np.float64)
                v = (v / np.uint32(0xFFFFFFFF) * 2.0 - 1.0).astype(np.float32)
                out_feats.append(v.tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b or b"")).astype("int64"),
                    "features": out_feats,
                }
            )

    return df.mapInPandas(
        feats,
        schema="media_id bigint, kind string, n_bytes bigint, features array<float>",
    )


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling plan: explode frame indices 0..n_frames-1
    step every_n (pure column expressions; the per-frame decode is the
    same stubbed boundary as extract_features)."""
    vids = df.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_media(df: DataFrame, max_side: int = 720, use_stub: bool = True) -> DataFrame:
    """Resize plan for image media: target dims fit within ``max_side``
    preserving aspect (the reference's load_image size policy —
    data/functions.py:33-78 validates ≥32 px and warns <720). The
    TARGET-DIMENSION math is integer column expressions (JVM-side);
    only the pixel resample crosses into the Arrow stub, which emits a
    deterministic blake2b digest of (payload, target dims) in place of
    real pixels — the same documented codec boundary as
    extract_features (no image libraries in this container;
    ``use_stub=False`` raises)."""
    if not use_stub:
        raise NotImplementedError(
            "real pixel resampling needs an image codec; this container "
            "has none (documented stub boundary)"
        )
    imgs = df.filter(F.col("kind") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    long_side = F.greatest(w, h)
    tw = F.when(long_side <= max_side, w).otherwise(
        F.round(w * max_side / long_side).cast("int")
    )
    th = F.when(long_side <= max_side, h).otherwise(
        F.round(h * max_side / long_side).cast("int")
    )
    planned = imgs.select(
        "media_id", "payload",
        w.alias("src_w"), h.alias("src_h"),
        tw.alias("dst_w"), th.alias("dst_h"),
    )

    def stub(batches):
        import hashlib

        for pdf in batches:
            digests = [
                hashlib.blake2b(
                    bytes(p) + f"{dw}x{dh}".encode(), digest_size=16
                ).digest()
                for p, dw, dh in zip(pdf["payload"], pdf["dst_w"], pdf["dst_h"])
            ]
            out = pdf[["media_id", "src_w", "src_h", "dst_w", "dst_h"]].copy()
            out["resized"] = digests
            yield out

    return planned.mapInPandas(
        stub,
        schema="media_id bigint, src_w int, src_h int, dst_w int, dst_h int, "
               "resized binary",
    )
