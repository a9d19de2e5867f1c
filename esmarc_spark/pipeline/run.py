"""Pipeline orchestration: S0 webtext -> S5 triples, batch or incremental.

``run_pipeline`` is the pure dataflow (DataFrame in, DataFrame out) — used
by tests, bench, and __spark_entry__. ``run_incremental`` wraps it with
checkpoint/resume + per-partition lineage (north_rule).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esmarc_spark.pipeline.canonicalize import canonical_mapping, rewrite_through_canonical
from esmarc_spark.pipeline.extract_text import dedup_by_url, with_extracted_text
from esmarc_spark.pipeline.link import link_mentions
from esmarc_spark.pipeline.materialize import linked_to_triples
from esmarc_spark.pipeline.mentions import (
    detect_mentions,
    detect_mentions_ngram,
    detect_mentions_tokenized,
)
from esmarc_spark.pipeline.checkpoint import CheckpointStore


def run_pipeline(
    webtext: DataFrame,
    gazetteer: DataFrame,
    same_as_edges: DataFrame | None = None,
    canonical_map: DataFrame | None = None,
    mentions_mode: str = "ngram",
    source_index: str = "webtext",
) -> DataFrame:
    """S1 extract -> dedup -> S2 mentions -> S3 link -> (S4 canonicalize)
    -> S5 triples. Returns the triples DataFrame (lazy).

    mentions_mode: "ngram" (default — JVM-only token n-gram join, the hot
    path that scales), "regex" (pandas-UDF char-offset scan; exact
    word-boundary semantics incl. punctuation-adjacent matches), or "token"
    (single-token JVM join).

    Pass ``canonical_map`` (precomputed uri->canonical dim) when calling in
    a loop — recomputing connected components per partition would repeat the
    iterative join cascade for every partition.
    """
    docs = dedup_by_url(with_extracted_text(webtext))
    if mentions_mode == "ngram":
        mentions = detect_mentions_ngram(docs, gazetteer)
    elif mentions_mode == "token":
        mentions = detect_mentions_tokenized(docs, gazetteer)
    else:
        surfaces = [r["surface_form"] for r in gazetteer.select("surface_form").distinct().collect()]
        mentions = detect_mentions(docs, surfaces)
    linked = link_mentions(mentions, gazetteer)
    if canonical_map is None and same_as_edges is not None:
        canonical_map = canonical_mapping(same_as_edges)
    if canonical_map is not None:
        linked = rewrite_through_canonical(linked, canonical_map, "canonical_url")
    return linked_to_triples(linked, source_index=source_index)


def run_incremental(
    spark: SparkSession,
    webtext: DataFrame,
    gazetteer: DataFrame,
    out_root: str,
    same_as_edges: DataFrame | None = None,
    fail_after_partitions: int | None = None,
) -> dict:
    """Checkpoint-resumable run, one days(warc_ts) partition at a time.

    ``fail_after_partitions`` injects a crash for the kill/rerun test.
    Returns a lineage summary dict.
    """
    store = CheckpointStore(spark, out_root)
    run_id = uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    canonical_map = None
    if same_as_edges is not None:
        # CC once for the whole run, not once per partition; the mapping dim
        # is small (∝ linked-entity count) so cache + broadcast downstream.
        canonical_map = canonical_mapping(same_as_edges).cache()
        canonical_map.count()

    partitioned = webtext.withColumn("pday", F.date_format("warc_ts", "yyyy-MM-dd"))
    all_days = [r["pday"] for r in partitioned.select("pday").distinct().collect()]
    done = {r["pday"] for r in store.completed_partitions().collect()}
    pending = sorted(set(all_days) - done)

    processed = []
    for n, pday in enumerate(pending):
        if fail_after_partitions is not None and n >= fail_after_partitions:
            raise RuntimeError(f"injected failure before partition {pday}")
        t0 = time.time()
        part = partitioned.where(F.col("pday") == pday)
        triples = run_pipeline(
            part, gazetteer, canonical_map=canonical_map, source_index=pday
        ).withColumn("pday", F.lit(pday))
        triples.write.mode("overwrite").partitionBy("pday").parquet(
            f"{out_root}/triples"
        )
        written = spark.read.parquet(f"{out_root}/triples").where(
            F.col("pday") == pday
        )
        counts = written.agg(
            F.count("*").alias("n_triples"),
            F.count(F.when(F.col("pred") == "mentions", 1)).alias("n_mentions"),
        ).collect()[0]
        metrics = part.agg(
            F.count("*").alias("n_docs"), F.max("warc_ts").alias("wm")
        ).collect()[0]
        store.record(
            [
                {
                    "pday": pday,
                    "status": "done",
                    "watermark_ts": metrics["wm"],
                    "run_id": run_id,
                    "n_docs": metrics["n_docs"],
                    "n_mentions": counts["n_mentions"],
                    "n_triples": counts["n_triples"],
                    "wall_sec": time.time() - t0,
                }
            ]
        )
        processed.append(pday)
    return {
        "run_id": run_id,
        "processed": processed,
        "skipped_done": sorted(done & set(all_days)),
        "out": f"{out_root}/triples",
    }
