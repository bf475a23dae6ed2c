"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
`modality` tag and a metadata struct. The decode/feature-extract stages
are Arrow-batched `mapInPandas` operators with REAL Spark plumbing
(schema, batching, partition behavior) and a clearly-marked stub where a
codec library (Pillow/ffmpeg/torchaudio) would be called — those libs
are not in this container, so the stub derives deterministic fake
features from the raw bytes (documented below) and raises
NotImplementedError when `strict=True`.

Scale notes: binary payloads never shuffle — metadata extraction is a
mapInPandas projection; downstream joins/agg run on the (id, metadata)
columns only, so `select` the payload away before any wide op.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
])

META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("modality", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha1_prefix", StringType()),
    StructField("width", IntegerType()),        # image/video; -1 otherwise
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),     # audio/video; -1 otherwise
])


def _fake_decode(payload: bytes, modality: str) -> tuple[int, int, int]:
    """STUB for the real codec call (Pillow / ffprobe / soundfile).

    Deterministic fake: dimensions/duration derived from payload bytes so
    tests are stable. Replace the body with the real decoder on a cluster
    image that ships codec libraries.
    """
    h = hashlib.sha1(payload).digest()
    if modality == "image":
        return 64 + h[0] % 1024, 64 + h[1] % 1024, -1
    if modality == "video":
        return 320 + h[0] % 1600, 240 + h[1] % 840, 1000 * (1 + h[2] % 600)
    if modality == "audio":
        return -1, -1, 1000 * (1 + h[2] % 3600)
    raise ValueError(f"unknown modality: {modality}")


def extract_metadata(df: DataFrame, strict: bool = False) -> DataFrame:
    """media frame → metadata frame via Arrow-batched mapInPandas.

    `strict=True` refuses the fake decode (production guard)."""
    if strict:
        raise NotImplementedError(
            "real codec decode requires Pillow/ffmpeg — not in this "
            "container; run with strict=False for the deterministic stub")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, d = [], [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                ww, hh, dd = _fake_decode(bytes(payload), modality)
                w.append(ww), h.append(hh), d.append(dd)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                "sha1_prefix": [hashlib.sha1(bytes(p)).hexdigest()[:12]
                                for p in pdf["payload"]],
                "width": pd.array(w, dtype="int32"),
                "height": pd.array(h, dtype="int32"),
                "duration_ms": pd.array(d, dtype="int64"),
            })

    return df.mapInPandas(_extract, META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: rows (media_id, frame_ts_ms) for each
    frame a decoder would extract — pure Catalyst sequence/explode, no
    Python. The actual pixel decode is the stub above."""
    meta = df
    return (meta.filter(F.col("modality") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0).cast("long"),
                        F.col("duration_ms") - 1,
                        F.lit(every_ms).cast("long")))
                    .alias("frame_ts_ms")))


def synthesize_media_from_text(df: DataFrame, id_col: str, text_col: str,
                               ) -> DataFrame:
    """Deterministic media corpus for tests: payload = utf-8 bytes of the
    text, modality round-robined by id. Real pipelines read WARC/tar
    shards into the same MEDIA_SCHEMA."""
    modality = (F.when(F.col(id_col) % 3 == 0, "image")
                .when(F.col(id_col) % 3 == 1, "audio")
                .otherwise("video"))
    mime = (F.when(F.col(id_col) % 3 == 0, "image/png")
            .when(F.col(id_col) % 3 == 1, "audio/wav")
            .otherwise("video/mp4"))
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        modality.alias("modality"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8")
        .alias("payload"),
        mime.alias("mime"))
