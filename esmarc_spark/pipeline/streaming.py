"""Structured-Streaming rendering of the KG pipeline (SURVEY.md §2.7).

The reference is batch ETL; the north_rule's "checkpoint-resumable
watermarks" are primarily served by the batch-incremental path
(pipeline.run.run_incremental). This module adds the *streaming* rendering
for continuously-arriving webtext:

  readStream(parquet dir) -> S1/S2/S3 (all stateless map/broadcast-join
  stages — they transfer to streaming unchanged) -> append sink, with
  Trigger.AvailableNow for catch-up runs and the engine's own checkpoint
  dir for exactly-once progress.

Aggregating shapes (the entity-level triples) need watermarked state; the
stateless page-level shapes stream as-is, and entity aggregates are left to
the periodic batch pass — the standard lambda split for this workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esmarc_spark.lookups.dims import TARGET_ID
from esmarc_spark.pipeline.extract_text import with_extracted_text
from esmarc_spark.pipeline.link import link_mentions
from esmarc_spark.pipeline.mentions import detect_mentions_ngram

WEBTEXT_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_page_triples(
    spark: SparkSession,
    input_dir: str,
    gazetteer: DataFrame,
    source_index: str = "webtext-stream",
) -> DataFrame:
    """Streaming DataFrame of page-level triples from a parquet directory
    source. All stages are stateless, so no watermark is required; url-level
    dedup across micro-batches belongs to the downstream MERGE/compaction
    (idempotent by (subj, pred, obj))."""
    stream = (
        spark.readStream.schema(WEBTEXT_SCHEMA).parquet(input_dir)
    )
    docs = with_extracted_text(stream)
    mentions = detect_mentions_ngram(docs, gazetteer)
    linked = link_mentions(mentions, gazetteer)
    entity_id = F.concat(
        F.lit(TARGET_ID), F.col("entity_type"), F.lit("/"), F.col("authority_id")
    )
    page_mentions = linked.select(
        F.col("url").alias("subj"),
        F.lit("mentions").alias("pred"),
        entity_id.alias("obj"),
    )
    page_prov = linked.select("url").dropDuplicates(["url"]).select(
        F.col("url").alias("subj"),
        F.lit("isBasedOn").alias("pred"),
        F.concat(F.lit(f"{TARGET_ID}source/{source_index}/"), F.col("url")).alias("obj"),
    )
    return page_mentions.unionByName(page_prov)


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    gazetteer: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Catch-up run: process everything currently available, exactly once
    (engine checkpoint), then stop — the streaming analogue of the batch
    incremental loop. Safe to invoke repeatedly; processed files are
    remembered in the checkpoint."""
    triples = stream_page_triples(spark, input_dir, gazetteer)
    query = (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def windowed_mention_counts(
    spark: SparkSession,
    input_dir: str,
    gazetteer: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful variant: watermarked tumbling-window mention counts per
    entity — late rows beyond the watermark are dropped, state is bounded.
    (The streaming rendering of link.count_mentions_salted.)"""
    stream = spark.readStream.schema(WEBTEXT_SCHEMA).parquet(input_dir)
    docs = with_extracted_text(stream).withWatermark("warc_ts", watermark)
    # warc_ts rides through detection as a passthrough column — stateless
    # stages preserve the event time, so no stream-stream join is needed
    mentions = detect_mentions_ngram(docs, gazetteer, extra_cols=("warc_ts",))
    linked = mentions.join(
        F.broadcast(gazetteer), "surface_form"
    )
    return (
        linked.groupBy(
            F.window("warc_ts", window).alias("win"),
            F.col("canonical_url"),
        )
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("win.start").alias("window_start"),
            "canonical_url",
            "n_mentions",
        )
    )
