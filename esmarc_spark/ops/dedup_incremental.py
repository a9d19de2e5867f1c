"""Incremental corpus dedup across runs (round 6 — VERDICT r5 #2).

``dedup_corpus`` is whole-corpus: adding one day of crawl to a deduped
corpus re-minhashes and re-clusters everything. A real training pipeline
dedups every new dump against the historical corpus via a persisted
signature index — the same accumulate-state-and-anti-join shape as the
reference's enrichment bots, which prefilter against already-enriched
records instead of recomputing them (reference
enrichment/wikidata.py:129-134), applied to dedup.

Per new dump the work is:

1. minhash + band the NEW docs only;
2. candidates = new x new (bucketed, degenerate-bucket guard) plus
   new x history — the new band keys joined against the persisted
   signature index (never history x history: those pairs were emitted
   by earlier dumps);
3. exact-Jaccard verify candidates only (historical shingles are
   recomputed for the few candidate docs via a semi-join pushdown on
   the history table — not for the whole corpus);
4. connected components over the CONTRACTED graph: historical docs
   enter as their current cluster root (from the persisted mapping),
   so CC runs on |new docs| + |touched clusters| nodes, not the corpus;
5. publish: the new dump's band keys appended to the signature index,
   the cluster mapping rewritten (a new doc can merge two historical
   clusters, or even become their new min-id root), one atomic marker.

Cost per dump is therefore O(new + touched history), independent of
corpus age, while the result equals from-scratch ``dedup_corpus`` over
the concatenated dumps (tested on 3-dump corpora including cross-dump
clusters and root demotion) — PROVIDED no (band, band_key) bucket
exceeds the star-guard cap. Past the cap, both paths take the guarded
star edges (``pairs_from_buckets``), whose recall depends on which
doc_id is the bucket minimum — and the incremental path sees per-dump
buckets plus cross-dump candidate slices rather than the full-corpus
bucket, so the two runs can diverge on guarded buckets (ADVICE r6 #4;
the equality tests pin the sub-cap regime).

State layout under ``state_root`` (any fsio-capable URI):

* ``sigs/dump=<id>/``        parquet (band, band_key, doc_id)
* ``mapping/version=<N>/``   parquet (doc_id, root) — full current map
* ``_STATE``                 JSON {"dumps": [...], "mapping_version": N}
                             — the single atomic commit point
                             (fsio.write_text_atomic). A crash before
                             the marker leaves orphan dirs that the
                             deterministic rerun overwrites; a crash
                             after it is a completed dump.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esmarc_spark.ops.dedup import (
    lsh_buckets,
    minhash_signatures,
    ngram_jaccard,
    pairs_from_buckets,
    shingles_col,
    signed_node_col,
    signed_unnode_col,
)
from esmarc_spark.pipeline import fsio


class DedupState:
    """Reader/writer for the persisted dedup state (see module doc)."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def manifest(self) -> dict:
        raw = fsio.read_text(fsio.join(self.root, "_STATE"))
        if raw is None:
            return {"dumps": [], "mapping_version": 0}
        return json.loads(raw)

    def signatures(self, spark: SparkSession) -> DataFrame | None:
        dumps = self.manifest()["dumps"]
        if not dumps:
            return None
        paths = [fsio.join(self.root, "sigs", f"dump={d}") for d in dumps]
        return spark.read.parquet(*paths)

    def mapping(self, spark: SparkSession) -> DataFrame | None:
        v = self.manifest()["mapping_version"]
        if v == 0:
            return None
        return spark.read.parquet(
            fsio.join(self.root, "mapping", f"version={v}")
        )

    def _publish(self, dumps: list[str], mapping_version: int) -> None:
        fsio.write_text_atomic(
            fsio.join(self.root, "_STATE"),
            json.dumps({"dumps": dumps, "mapping_version": mapping_version}),
        )

    def vacuum(self) -> None:
        """GC superseded mapping versions. Deliberately NOT part of the
        per-dump publish: survivor DataFrames handed out earlier are
        lazy reads of their mapping version, so deletion is a separate
        maintenance action (the same reason table formats split commit
        from vacuum). Always crash-safe — only versions below the
        committed marker are touched."""
        current = self.manifest()["mapping_version"]
        for name in fsio.list_child_dirs(
            fsio.join(self.root, "mapping"), "version="
        ):
            if int(name.split("=", 1)[1]) < current:
                fsio.delete_dir(fsio.join(self.root, "mapping", name))


def _cross_candidates(
    b_new: DataFrame, hist: DataFrame, max_bucket_size: int | None
) -> DataFrame:
    """(new_id, old_id) candidates: new band keys joined against the
    historical signature index. The degenerate-bucket guard mirrors
    ``pairs_from_buckets``: a historical bucket larger than the cap
    (a template cluster accumulated across dumps) contributes only its
    min-doc_id representative to the join — O(new) instead of
    O(new x bucket) — and CC restores cluster membership through the
    representative."""
    renamed = hist.withColumnRenamed("doc_id", "old_id")
    if max_bucket_size is None:
        joined = b_new.join(renamed, ["band", "band_key"])
        return joined.select(
            F.col("doc_id").alias("new_id"), "old_id"
        ).distinct()
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "band_key")
    ann = renamed.select(
        "band",
        "band_key",
        "old_id",
        F.count(F.lit(1)).over(w).alias("_n"),
        F.min("old_id").over(w).alias("_rep"),
    )
    small = ann.where(F.col("_n") <= max_bucket_size).drop("_n", "_rep")
    big_reps = (
        ann.where(F.col("_n") > max_bucket_size)
        .select("band", "band_key", F.col("_rep").alias("old_id"))
        .distinct()
    )
    joined = b_new.join(small.unionByName(big_reps), ["band", "band_key"])
    return joined.select(F.col("doc_id").alias("new_id"), "old_id").distinct()


def _verified_cross_edges(
    new_docs: DataFrame,
    history_docs: DataFrame,
    cross: DataFrame,
    threshold: float,
    shingle_k: int,
) -> DataFrame:
    """Exact-Jaccard verify (new_id, old_id) candidates. Historical
    shingles are computed ONLY for candidate docs: the semi-join runs
    before the shingle explode, so the history scan prunes to the few
    touched rows (id-pushdown, not a corpus re-read)."""
    sh_new = new_docs.select(
        F.col("doc_id").alias("new_id"),
        F.array_distinct(shingles_col(k=shingle_k)).alias("sh_a"),
    )
    touched = history_docs.join(
        cross.select(F.col("old_id").alias("doc_id")).distinct(),
        "doc_id",
        "left_semi",
    )
    sh_old = touched.select(
        F.col("doc_id").alias("old_id"),
        F.array_distinct(shingles_col(k=shingle_k)).alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cross.join(sh_new, "new_id")
        .join(sh_old, "old_id")
        .select(
            "new_id",
            "old_id",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "old_id")
    )


def dedup_incremental_dump(
    spark: SparkSession,
    new_docs: DataFrame,
    state_root: str,
    dump_id: str,
    history_docs: DataFrame | None = None,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Dedup one new dump against the accumulated state; returns the new
    dump's surviving rows (full input schema) and commits the updated
    state. ``history_docs`` must cover ALL docs of committed dumps —
    survivors AND dropped duplicates (a new doc can match a dropped old
    doc whose cluster root is a different row); it is only read through
    a candidate semi-join, never scanned whole. Re-running an
    already-committed dump_id is a read-only no-op returning the same
    survivors."""
    state = DedupState(state_root)
    manifest = state.manifest()
    if dump_id in manifest["dumps"]:
        return _survivors_against(new_docs, state.mapping(spark))
    if manifest["dumps"] and history_docs is None:
        raise ValueError(
            "history_docs is required once the state holds committed dumps"
        )

    rows_per_band = num_hashes // bands
    b_new = lsh_buckets(
        minhash_signatures(new_docs, num_hashes, shingle_k),
        bands,
        rows_per_band,
    ).localCheckpoint(eager=False)

    nn_pairs = pairs_from_buckets(b_new, max_bucket_size)
    nn_edges = (
        ngram_jaccard(new_docs, nn_pairs, shingle_k)
        .where(F.col("jaccard") >= threshold)
        .select(F.col("doc_a").alias("src_id"), F.col("doc_b").alias("dst_id"))
    )

    hist = state.signatures(spark)
    if hist is not None:
        cross = _cross_candidates(b_new, hist, max_bucket_size)
        cross_edges = _verified_cross_edges(
            new_docs, history_docs, cross, threshold, shingle_k
        )
        mapping = state.mapping(spark)
        if mapping is not None:
            # contract: each historical endpoint enters CC as its root
            m = mapping.withColumnRenamed("doc_id", "old_id").withColumnRenamed(
                "root", "_old_root"
            )
            cross_edges = (
                cross_edges.join(m, "old_id", "left")
                .select(
                    F.col("new_id").alias("src_id"),
                    F.coalesce("_old_root", "old_id").alias("dst_id"),
                )
            )
        else:
            cross_edges = cross_edges.select(
                F.col("new_id").alias("src_id"), F.col("old_id").alias("dst_id")
            )
        edges = nn_edges.unionByName(cross_edges)
    else:
        mapping = None
        edges = nn_edges

    from esmarc_spark.pipeline.canonicalize import canonical_mapping

    comp = (
        canonical_mapping(
            edges.select(
                signed_node_col("src_id").alias("src"),
                signed_node_col("dst_id").alias("dst"),
            )
        )
        .select(F.col("uri").alias("_u"), F.col("canonical_uri").alias("_c"))
        .select(
            signed_unnode_col("_u").alias("doc_id"),
            signed_unnode_col("_c").alias("root"),
        )
    )

    if mapping is not None:
        # translate historical roots that merged (possibly into a NEW
        # min-id root — previous survivors get demoted correctly), then
        # add entries for ids CC saw that the old map didn't know
        t = comp.select(
            F.col("doc_id").alias("root"), F.col("root").alias("_new_root")
        )
        translated = (
            mapping.join(t, "root", "left")
            .select("doc_id", F.coalesce("_new_root", "root").alias("root"))
        )
        fresh = comp.join(mapping, "doc_id", "left_anti")
        updated = translated.unionByName(fresh)
    else:
        updated = comp

    new_version = manifest["mapping_version"] + 1
    sig_path = fsio.join(state.root, "sigs", f"dump={dump_id}")
    map_path = fsio.join(state.root, "mapping", f"version={new_version}")
    b_new.write.mode("overwrite").parquet(sig_path)
    updated.write.mode("overwrite").parquet(map_path)
    state._publish(manifest["dumps"] + [dump_id], new_version)

    return _survivors_against(new_docs, spark.read.parquet(map_path))


def _survivors_against(docs: DataFrame, mapping: DataFrame | None) -> DataFrame:
    if mapping is None:
        return docs
    m = mapping.withColumnRenamed("root", "_root")
    return (
        docs.join(m, "doc_id", "left")
        .where(F.col("_root").isNull() | (F.col("_root") == F.col("doc_id")))
        .drop("_root")
    )


def incremental_survivors(
    spark: SparkSession, state_root: str, all_docs: DataFrame
) -> DataFrame:
    """Global survivor view after any number of committed dumps: rows of
    ``all_docs`` that are their own cluster root (or clustered with
    nothing). Equals from-scratch ``dedup_corpus(all_docs)`` when the
    dumps were committed in order AND no band bucket exceeded the
    star-guard cap (tested; see the module docstring for the guarded-
    bucket divergence)."""
    return _survivors_against(all_docs, DedupState(state_root).mapping(spark))
