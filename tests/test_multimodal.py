"""Multimodal tests: schema, batch shapes, pruning-friendly metadata path
(header-stub table), plus the REAL PPM/WAV/PPM-stream codec pipeline."""

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


def test_decode_stub_rejects_foreign_payloads():
    # real formats go through ops.media_codecs; the header stub only
    # accepts the synthetic-header table's payloads
    with pytest.raises(ValueError):
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


# ---------------------------------------------------------------------------
# round 2: REAL codecs (PPM / WAV / PPM-stream) — decode is no longer a stub
# ---------------------------------------------------------------------------


def test_codec_roundtrips():
    import numpy as np

    from esmarc_spark.ops import media_codecs as C

    px = ((np.arange(9 * 7 * 3).reshape(7, 9, 3) * 3) % 256).astype(np.uint8)
    assert (C.decode_ppm(C.encode_ppm(px)) == px).all()

    samples = (np.sin(np.arange(2000) / 7.0) * 10000).astype(np.int16)
    rate, back = C.decode_wav(C.encode_wav(samples, 8000))
    assert rate == 8000 and (back == samples).all()

    frames = [px, px[::-1].copy(), (px // 2).astype(np.uint8)]
    out = C.decode_ppm_stream(C.encode_ppm_stream(frames))
    assert len(out) == 3 and all((a == b).all() for a, b in zip(out, frames))

    small = C.resize_nearest(px, 4, 3)
    assert small.shape == (3, 4, 3)
    # corner pixels preserved by nearest-neighbor with floor mapping
    assert (small[0, 0] == px[0, 0]).all()


def test_real_decode_features(spark):
    from esmarc_spark.ops.multimodal import decode_features, synth_media_real

    media = synth_media_real(spark, n=30).cache()
    feats = decode_features(media).collect()
    assert len(feats) == 30
    by_mod = {}
    for r in feats:
        by_mod.setdefault(r.modality, []).append(r)
    assert set(by_mod) == {"image", "audio", "video"}
    for r in by_mod["image"]:
        assert r.width >= 16 and r.height >= 16 and r.n_frames == 1
        assert 0.0 <= r.feat[0] <= 1.0  # channel mean normalized
    for r in by_mod["audio"]:
        assert r.sample_rate == 8000 and r.duration_ms >= 250
        assert r.feat[0] > 0.1  # sine RMS well above silence
        assert 0 < r.feat[2] < 1  # zero-crossing rate
    for r in by_mod["video"]:
        assert r.n_frames >= 2 and r.width >= 12
    # determinism: same seed -> identical features
    again = decode_features(synth_media_real(spark, n=30)).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))


def test_real_resize_and_frames(spark):
    from esmarc_spark.ops import media_codecs as C
    from esmarc_spark.ops.multimodal import (
        resize_images,
        sample_video_frames,
        synth_media_real,
    )

    media = synth_media_real(spark, n=30).cache()
    resized = resize_images(media, out_w=8, out_h=6).collect()
    assert resized and all(r.width == 8 and r.height == 6 for r in resized)
    for r in resized:
        px = C.decode_ppm(bytes(r.media))
        assert px.shape == (6, 8, 3)

    frames = sample_video_frames(media, every=2).collect()
    assert frames
    for r in frames:
        assert r.frame_idx % 2 == 0
        assert C.decode_ppm(bytes(r.frame)).ndim == 3


def test_video_empty_stream_raises_clean_valueerror(spark):
    # ADVICE r2: an empty-but-valid ppm stream must hit the same clean
    # ValueError contract as junk image/audio payloads, not IndexError
    from esmarc_spark.ops.multimodal import decode_features

    df = spark.createDataFrame(
        [(1, "video", bytearray(b""))],
        "media_id long, modality string, media binary",
    )
    with pytest.raises(Exception, match="empty ppm stream"):
        decode_features(df).collect()


def test_media_meta_golden_matches_generator(spark):
    # pins tests/golden/media_meta.parquet (the DuckDB side of the
    # media_stats oracle) to the current synth_media generator output;
    # regen: scripts/regen_golden_media_stats.py
    import pyarrow.parquet as pq

    from esmarc_spark.ops.multimodal import synth_media

    golden = sorted(
        tuple(r)
        for r in pq.read_table(
            "/root/repo/tests/golden/media_meta.parquet"
        ).to_pylist()
        for r in [(r["media_id"], r["modality"], r["width"], r["height"], r["duration_ms"])]
    )
    current = sorted(
        (r.media_id, r.modality, r.meta.width, r.meta.height, r.meta.duration_ms)
        for r in synth_media(spark, n=300).select("media_id", "modality", "meta").collect()
    )
    assert golden == current


# ---------------------------------------------------------------------------
# round 3: format-sniffing decoders with optional Pillow/ffmpeg backends
# ---------------------------------------------------------------------------


def test_sniffing_decoders_name_missing_backend():
    # without the optional backend the decoders must fail with a clear
    # dependency message (not a junk-payload message); with it, decode.
    import shutil

    from esmarc_spark.ops import media_codecs as C

    jpeg_payload = b"\xff\xd8\xff\xe0" + b"\x00" * 64
    mp4_payload = b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64
    ogg_payload = b"OggS" + b"\x00" * 64

    try:
        import PIL  # noqa: F401
        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(ValueError, match="Pillow"):
            C.decode_image(jpeg_payload)
    if not shutil.which("ffmpeg"):
        with pytest.raises(ValueError, match="ffmpeg"):
            C.decode_video_frames(mp4_payload)
        with pytest.raises(ValueError, match="ffmpeg"):
            C.decode_audio(ogg_payload)
    # junk that matches no magic keeps the junk-payload contract
    with pytest.raises(ValueError, match="unrecognized"):
        C.decode_image(b"garbage")
    with pytest.raises(ValueError, match="unrecognized"):
        C.decode_audio(b"garbage")
    with pytest.raises(ValueError, match="unrecognized"):
        C.decode_video_frames(b"garbage")


def test_jpeg_png_decode_with_pillow(spark):
    # runs only where Pillow is installed (skipped in the dev sandbox)
    PILImage = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from esmarc_spark.ops import media_codecs as C
    from esmarc_spark.ops.multimodal import decode_features

    px = ((np.arange(24 * 16 * 3).reshape(16, 24, 3) * 7) % 256).astype(np.uint8)
    buf = io.BytesIO()
    PILImage.fromarray(px, mode="RGB").save(buf, format="PNG")
    png = buf.getvalue()
    assert (C.decode_image(png) == px).all()

    jbuf = io.BytesIO()
    PILImage.fromarray(px, mode="RGB").save(jbuf, format="JPEG", quality=95)
    # lossy: decode must roundtrip shape and be close in value
    out = C.decode_image(jbuf.getvalue())
    assert out.shape == px.shape
    assert abs(float(out.mean()) - float(px.mean())) < 8.0

    # end-to-end through the Arrow plumbing: a PNG row in the media table
    df = spark.createDataFrame(
        [(1, "image", bytearray(png))],
        "media_id long, modality string, media binary",
    )
    feats = decode_features(df).collect()
    assert feats[0].width == 24 and feats[0].height == 16


def test_mp4_decode_with_ffmpeg():
    # runs only where an ffmpeg binary exists (skipped in the dev sandbox)
    import shutil
    import subprocess

    import numpy as np

    if not shutil.which("ffmpeg"):
        pytest.skip("ffmpeg binary not available")
    from esmarc_spark.ops import media_codecs as C

    proc = subprocess.run(
        [shutil.which("ffmpeg"), "-v", "error",
         "-f", "lavfi", "-i", "testsrc=duration=0.2:size=64x48:rate=10",
         "-f", "mp4", "-movflags", "frag_keyframe+empty_moov", "pipe:1"],
        capture_output=True, check=True,
    )
    frames = C.decode_video_frames(proc.stdout)
    assert frames and all(f.shape == (48, 64, 3) for f in frames)
    assert isinstance(frames[0], np.ndarray)
