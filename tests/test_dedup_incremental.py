"""Incremental corpus dedup (round 6 — VERDICT r5 #2): per-dump dedup
against a persisted signature index + cluster mapping must provably
equal from-scratch dedup_corpus over the concatenated dumps, survive
crash/rerun, and stay read-only on replay."""

import pytest

from esmarc_spark.ops.dedup import dedup_corpus
from esmarc_spark.ops.dedup_incremental import (
    DedupState,
    dedup_incremental_dump,
    incremental_survivors,
)

BASE = (
    "the quick brown fox jumps over the lazy dog again and again today "
)


def _dumps(spark):
    """Three dumps engineered to exercise the hard shapes:

    * dump1: cluster {10, 11} plus unique 12;
    * dump2: 20 joins cluster-10 via similarity to 11 (a DROPPED old
      doc, not the root — exercises history coverage beyond survivors);
      5 starts a new cluster seed; ids 5 < 10 set up demotion;
    * dump3: 3 joins 10's cluster with the new global min id (root 10
      demotes to 3), and 4 joins 5's one-doc cluster with a smaller id
      (root 5 demotes to 4) — two historical roots demoted in one dump.
    """
    d1 = spark.createDataFrame(
        [
            (10, BASE + "variant alpha"),
            (11, BASE + "variant beta"),
            (12, "totally unrelated text about parquet footers and stats"),
        ],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [
            (20, BASE + "variant beta prime"),
            (5, "another shared template about spark adaptive query execution engine"),
            (21, "unique second dump document concerning arrow record batches"),
        ],
        "doc_id long, text string",
    )
    d3 = spark.createDataFrame(
        [
            (3, BASE + "variant gamma"),
            (4, "another shared template about spark adaptive query execution planner"),
            (30, "unique third dump document on shuffle partition coalescing"),
        ],
        "doc_id long, text string",
    )
    return d1, d2, d3


def _run_dumps(spark, root, d1, d2, d3):
    s1 = dedup_incremental_dump(spark, d1, root, "d1")
    hist1 = d1
    s2 = dedup_incremental_dump(spark, d2, root, "d2", history_docs=hist1)
    hist2 = hist1.unionByName(d2)
    s3 = dedup_incremental_dump(spark, d3, root, "d3", history_docs=hist2)
    return s1, s2, s3, hist2.unionByName(d3)


def test_incremental_equals_from_scratch(spark, tmp_path):
    d1, d2, d3 = _dumps(spark)
    root = str(tmp_path / "state")
    s1, s2, s3, all_docs = _run_dumps(spark, root, d1, d2, d3)

    inc = sorted(
        r.doc_id for r in incremental_survivors(spark, root, all_docs).collect()
    )
    scratch = sorted(
        r.doc_id for r in dedup_corpus(all_docs, threshold=0.5).collect()
    )
    assert inc == scratch
    # the engineered shapes actually happened: every dump clustered with
    # history, and the final root of the big cluster is dump3's id 3
    assert 3 in inc and 10 not in inc and 5 not in inc


def test_incremental_per_dump_survivors(spark, tmp_path):
    d1, d2, d3 = _dumps(spark)
    root = str(tmp_path / "state")
    s1, s2, s3, _ = _run_dumps(spark, root, d1, d2, d3)
    # dump1 sees no history: {10,11} collapse to 10
    assert sorted(r.doc_id for r in s1.collect()) == [10, 12]
    # dump2: 20 duplicates history (dropped), 5 and 21 survive so far
    assert sorted(r.doc_id for r in s2.collect()) == [5, 21]
    # dump3: 3 merges into the {10,11,20} cluster and becomes its root
    # (demoting 10); 4 joins 5's cluster and, being the smaller id,
    # demotes 5 and survives as the new root
    assert sorted(r.doc_id for r in s3.collect()) == [3, 4, 30]


def test_replay_committed_dump_is_readonly(spark, tmp_path):
    d1, d2, d3 = _dumps(spark)
    root = str(tmp_path / "state")
    _run_dumps(spark, root, d1, d2, d3)
    m_before = DedupState(root).manifest()
    replay = dedup_incremental_dump(
        spark, d2, root, "d2", history_docs=d1
    )
    # same survivors as the global view restricted to dump2 — note 5 was
    # DEMOTED by dump3, so the replay reflects the current mapping
    assert sorted(r.doc_id for r in replay.collect()) == [21]
    assert DedupState(root).manifest() == m_before


def test_crash_before_publish_then_rerun(spark, tmp_path, monkeypatch):
    d1, d2, d3 = _dumps(spark)
    root = str(tmp_path / "state")
    s1 = dedup_incremental_dump(spark, d1, root, "d1")

    from esmarc_spark.ops import dedup_incremental as mod

    real = mod.DedupState._publish
    monkeypatch.setattr(
        mod.DedupState,
        "_publish",
        lambda self, *a: (_ for _ in ()).throw(OSError("crash before marker")),
    )
    with pytest.raises(OSError):
        dedup_incremental_dump(spark, d2, root, "d2", history_docs=d1)
    # crash left orphan dirs but no commit: state still at dump1
    assert DedupState(root).manifest()["dumps"] == ["d1"]
    monkeypatch.setattr(mod.DedupState, "_publish", real)
    dedup_incremental_dump(spark, d2, root, "d2", history_docs=d1)
    dedup_incremental_dump(
        spark, d3, root, "d3", history_docs=d1.unionByName(d2)
    )
    all_docs = d1.unionByName(d2).unionByName(d3)
    inc = sorted(
        r.doc_id for r in incremental_survivors(spark, root, all_docs).collect()
    )
    scratch = sorted(
        r.doc_id for r in dedup_corpus(all_docs, threshold=0.5).collect()
    )
    assert inc == scratch


def test_uri_state_root(spark, tmp_path):
    d1, d2, d3 = _dumps(spark)
    root = f"file://{tmp_path}/state"
    _, _, _, all_docs = _run_dumps(spark, root, d1, d2, d3)
    inc = sorted(
        r.doc_id for r in incremental_survivors(spark, root, all_docs).collect()
    )
    scratch = sorted(
        r.doc_id for r in dedup_corpus(all_docs, threshold=0.5).collect()
    )
    assert inc == scratch
    # vacuum GCs superseded mapping versions (kept until then so lazy
    # survivor frames from earlier dumps stay readable)
    from esmarc_spark.pipeline import fsio

    DedupState(root).vacuum()
    versions = fsio.list_child_dirs(fsio.join(root, "mapping"), "version=")
    assert versions == ["version=3"]
    assert inc == sorted(
        r.doc_id for r in incremental_survivors(spark, root, all_docs).collect()
    )


def test_history_required_once_state_exists(spark, tmp_path):
    d1, d2, _ = _dumps(spark)
    root = str(tmp_path / "state")
    dedup_incremental_dump(spark, d1, root, "d1")
    with pytest.raises(ValueError, match="history_docs"):
        dedup_incremental_dump(spark, d2, root, "d2")
