#!/usr/bin/env python3
"""Regenerate tests/golden/media_meta.parquet — the metadata slice of the
deterministic synth_media table (media_id, modality, width, height,
duration_ms; never the binary payload).

Unlike the bot goldens this is NOT a precomputed answer: the DuckDB side
of the media_stats oracle re-runs the groupBy/avg aggregation itself over
this parquet, so the driver's value-hash checks the aggregation logic in
a second engine. The pytest gate (tests/test_multimodal.py) pins the
vendored file to the current generator output."""

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from esmarc_spark.ops.multimodal import synth_media  # noqa: E402
from esmarc_spark.session import get_spark  # noqa: E402

spark = get_spark("regen-media-meta", cpus=8)
rows = sorted(
    (r.media_id, r.modality, r.meta.width, r.meta.height, r.meta.duration_ms)
    for r in synth_media(spark, n=300).select("media_id", "modality", "meta").collect()
)
table = pa.table(
    {
        "media_id": pa.array([r[0] for r in rows], pa.int64()),
        "modality": pa.array([r[1] for r in rows], pa.string()),
        "width": pa.array([r[2] for r in rows], pa.int32()),
        "height": pa.array([r[3] for r in rows], pa.int32()),
        "duration_ms": pa.array([r[4] for r in rows], pa.int32()),
    }
)
out = REPO / "tests" / "golden" / "media_meta.parquet"
pq.write_table(table, out)
print(f"{len(rows)} rows -> {out}")
spark.stop()
