"""Multimodal plumbing tests: schema, batch shapes, pruning-friendly
metadata path; decode itself is a documented stub."""

import pytest
from pyspark.sql import functions as F

from esmarc_spark.ops.multimodal import (
    decode_image_stub,
    extract_features,
    media_metadata_stats,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=60).cache()


def test_media_schema_and_header(media):
    rows = media.collect()
    assert len(rows) == 60
    for r in rows[:10]:
        w, h, body = decode_image_stub(bytes(r.media))
        assert w == r.meta.width and h == r.meta.height
        assert body


def test_decode_stub_raises_on_real_media():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"tiny")


def test_extract_features(media):
    feats = extract_features(media, feat_dim=16).collect()
    assert len(feats) == 60
    assert all(len(r.feat) == 16 and r.feat_dim == 16 for r in feats)
    # deterministic
    feats2 = extract_features(media, feat_dim=16).collect()
    assert sorted((r.media_id, tuple(r.feat)) for r in feats) == sorted(
        (r.media_id, tuple(r.feat)) for r in feats2
    )


def test_sample_frames(media):
    frames = sample_frames(media, every_ms=10_000).collect()
    videos = {r.media_id: r for r in media.where(F.col("modality") == "video").collect()}
    assert frames
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for media_id, idxs in by_media.items():
        expected = max(1, videos[media_id].meta.duration_ms // 10_000)
        assert sorted(idxs) == list(range(expected))


def test_metadata_stats_prunes_binary(media, spark, tmp_path):
    path = str(tmp_path / "media")
    media.write.parquet(path)
    on_disk = spark.read.parquet(path)
    plan = media_metadata_stats(on_disk)._jdf.queryExecution().executedPlan().toString()
    assert "media" not in plan.split("ReadSchema")[-1][:400], (
        "binary column not pruned from scan"
    )
    stats = {r.modality: r.n for r in media_metadata_stats(on_disk).collect()}
    assert set(stats) == {"image", "audio", "video"}
