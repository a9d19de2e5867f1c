"""Watermarked windowed mention counts (stateful streaming) — the
streaming rendering of the salted mention aggregation."""

import pytest
from pyspark.sql import functions as F

from esmarc_spark.pipeline.streaming import windowed_mention_counts
from esmarc_spark.pipeline.webtext import gazetteer_df, synth_webtext


def test_windowed_mention_counts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    gaz = gazetteer_df(spark)
    # two distinct hours of data
    wt = synth_webtext(spark, n_docs=100, partitions=2, dup_fraction=0).withColumn(
        "warc_ts",
        F.timestamp_seconds(F.lit(1700000000) + F.pmod(F.xxhash64("url"), F.lit(2)) * 3600),
    )
    wt.write.mode("overwrite").parquet(in_dir)

    counts = windowed_mention_counts(spark, in_dir, gaz, window="1 hour")
    query = (
        counts.writeStream.format("memory")
        .queryName("mention_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = spark.sql("select * from mention_counts").collect()
    assert rows
    # two windows present, counts positive, Germany (Zipf head) dominant
    windows = {r.window_start for r in rows}
    assert len(windows) == 2
    by_entity = {}
    for r in rows:
        assert r.n_mentions > 0
        by_entity[r.canonical_url] = by_entity.get(r.canonical_url, 0) + r.n_mentions
    top = max(by_entity, key=by_entity.get)
    assert top.endswith("4011882-4")  # Germany's GND uri
