"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over `mapInPandas`. The actual codec step is STUBBED in this
container (no image/audio libs): `decode_image` raises NotImplementedError
unless `fake=True`, in which case a deterministic fake decoder (seeded by the
payload hash) produces plausible metadata — the Spark-side plumbing (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests: wrap document text bytes as opaque media payloads."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def _real_decode(payload: bytes, media_type: str):
    raise NotImplementedError(
        "media codecs (PIL/av/librosa) are not available in this environment; "
        "run with fake=True for the deterministic stub decoder"
    )


def _fake_decode(payload: bytes, media_type: str, feat_dim: int = 8):
    """Deterministic fake decode: metadata + feature vector derived from the
    payload digest, so tests are stable and the Arrow plumbing is exercised."""
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0]
    height = 64 + d[1]
    n_frames = 1 + d[2] % 32 if media_type == "video" else (1 if media_type == "image" else None)
    feature = [round(b / 255.0, 6) for b in d[:feat_dim]]
    return width, height, n_frames, feature


def decode_media(media: DataFrame, fake: bool = True, feat_dim: int = 8) -> DataFrame:
    """mapInPandas decode/feature-extract. Arrow-batched; one output row per
    input row; nullable fields depend on media_type."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "media_type": [], "n_bytes": [],
                "width": [], "height": [], "n_frames": [], "feature": [],
            }
            for mid, payload, mtype in zip(pdf["media_id"], pdf["payload"], pdf["media_type"]):
                raw = bytes(payload)
                if fake:
                    w, h, nf, feat = _fake_decode(raw, mtype, feat_dim)
                else:
                    w, h, nf, feat = _real_decode(raw, mtype)
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["n_bytes"].append(len(raw))
                out["width"].append(w if mtype in ("image", "video") else None)
                out["height"].append(h if mtype in ("image", "video") else None)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame sampling plan for video rows: explode frame indices 0..n_frames-1
    stepping `every_n` — pure column ops (sequence + explode)."""
    return (
        decoded.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))),
        )
        .select("media_id", "frame_idx", "width", "height")
    )
