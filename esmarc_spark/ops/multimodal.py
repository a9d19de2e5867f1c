"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual media decoding is STUBBED
(``decode_image_stub``) because no image/audio libraries exist in this
container. Swapping the stub for Pillow/torchaudio/ffmpeg changes one
function body, not the plan.

Design points for 100 TB of media:
  * media rows are (id, modality, media binary, meta struct); the binary
    column never participates in joins/aggregations — metadata is projected
    out early so Parquet column pruning skips the heavy bytes when a query
    only touches metadata;
  * decode/feature stages are ``mapInPandas`` (Arrow batches of binary);
    batch size is capped via maxRecordsPerBatch because media rows are MBs;
  * frame sampling / resizing emit one row per sample with explicit keys so
    downstream shuffles are uniform.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, media binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURES_SCHEMA = "media_id long, modality string, feat array<float>, feat_dim int"

FRAMES_SCHEMA = "media_id long, frame_idx int, frame binary"


def synth_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: the binary payload is a seeded byte
    pattern whose header encodes (width, height) so the stub 'decoder' has
    something real to parse."""
    def h(col, salt):
        return F.abs(F.xxhash64(col, F.lit(seed), F.lit(salt)))

    df = spark.range(n)
    width = (h(F.col("id"), 1) % 640 + 16).cast("int")
    height = (h(F.col("id"), 2) % 480 + 16).cast("int")
    modality = F.when(F.col("id") % 3 == 0, "image").when(
        F.col("id") % 3 == 1, "audio"
    ).otherwise("video")
    # payload: 8-byte big-endian header (w, h as 4-byte ints) + id-keyed
    # filler; unhex(lpad(hex)) because ANSI mode forbids int->binary casts
    def be4(col):
        return F.unhex(F.lpad(F.hex(col), 8, "0"))

    payload = F.concat(
        be4(width),
        be4(height),
        F.encode(F.repeat(F.concat(F.lit("px"), F.col("id").cast("string")), 32), "UTF-8"),
    )
    return df.select(
        F.col("id").alias("media_id"),
        modality.alias("modality"),
        payload.alias("media"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
            width.alias("width"),
            height.alias("height"),
            (h(F.col("id"), 3) % 60000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, bytes]:
    """STUB decoder: parses the synthetic 8-byte header and returns
    (width, height, body). A real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload))``; everything around this
    function is production plumbing."""
    if payload is None or len(payload) < 8:
        raise NotImplementedError(
            "real media decoding needs an image library not present in this "
            "container; synthetic payloads carry a parsable header instead"
        )
    w = _struct.unpack(">i", payload[0:4])[0]
    h = _struct.unpack(">i", payload[4:8])[0]
    return w, h, payload[8:]


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: binary -> fixed-dim float vector.

    The stub derives a deterministic vector from a digest of the payload;
    a real model would run batched inference here (same Arrow batch shape).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mods, feats = [], [], []
            for media_id, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["media"]
            ):
                digest = hashlib.sha256(bytes(payload)).digest()
                vec = [
                    int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0
                    for i in range(feat_dim)
                ]
                ids.append(media_id)
                mods.append(modality)
                feats.append(vec)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "modality": pd.Series(mods, dtype="object"),
                    "feat": pd.Series(feats, dtype="object"),
                    "feat_dim": pd.Series([feat_dim] * len(ids), dtype="int32"),
                }
            )

    return media.select("media_id", "modality", "media").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    Frame *extraction* is stubbed (the 'frame' is a deterministic slice of
    the payload); the row-explosion shape, keying, and batch handling are
    the real thing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["media"], pdf["meta"]
            ):
                duration = int(meta["duration_ms"]) if meta is not None else 0
                n_frames = max(1, duration // every_ms)
                body = bytes(payload)[8:]
                for i in range(n_frames):
                    ids.append(media_id)
                    idxs.append(i)
                    start = (i * 16) % max(len(body), 1)
                    frames.append(body[start : start + 16])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return media.where(F.col("modality") == "video").select(
        "media_id", "media", "meta"
    ).mapInPandas(run, schema=FRAMES_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation: never touches the binary column, so the
    Parquet reader prunes it (verify with .explain -> ReadSchema)."""
    return (
        media.groupBy("modality")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.col("meta.width")), 2).alias("avg_width"),
            F.round(F.avg(F.col("meta.duration_ms")), 2).alias("avg_duration_ms"),
        )
        .orderBy("modality")
    )
