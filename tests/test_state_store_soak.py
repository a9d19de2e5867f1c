"""Round 7 (VERDICT r6 #8): one crash-replay soak matrix over every
persisted incremental state store (corpus dedup, line dedup, link
graph), parameterized posix path x file:// URI.

The invariant under test is the shared publish protocol (data dirs
first, atomic _STATE marker last, via pipeline.fsio):

* a writer crash BEFORE the marker leaves the previous manifest intact,
* a CONCURRENT READER holding a lazy frame from the previous commit
  keeps collecting correct results across the crash AND across the
  healing replay (no dirty reads of orphan dirs),
* the deterministic replay overwrites the orphans and commits,
* post-replay state equals from-scratch.
"""

import pytest
from pyspark.sql import functions as F


class DedupStore:
    name = "dedup"

    def setup(self, spark):
        def docs(lo, hi, dup_of=None):
            base = spark.range(lo, hi).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.lit("alpha beta gamma delta epsilon zeta"),
                    (F.col("id") % 7).cast("string"),
                    F.lit("eta theta iota kappa lambda"),
                    ((F.col("id") if dup_of is None else F.lit(dup_of)) % 13).cast("string"),
                ).alias("text"),
            )
            return base

        self.d1 = docs(0, 40)
        self.d2 = docs(40, 80).unionByName(
            spark.range(80, 90).select(
                F.col("id").alias("doc_id"),
                F.lit(
                    "alpha beta gamma delta epsilon zeta 3 eta theta iota kappa lambda 3"
                ).alias("text"),
            )
        )

    def state_cls(self):
        from esmarc_spark.ops.dedup_incremental import DedupState

        return DedupState

    def commit1(self, spark, root):
        from esmarc_spark.ops.dedup_incremental import dedup_incremental_dump

        return dedup_incremental_dump(spark, self.d1, root, "d1")

    def commit2(self, spark, root):
        from esmarc_spark.ops.dedup_incremental import dedup_incremental_dump

        return dedup_incremental_dump(
            spark, self.d2, root, "d2", history_docs=self.d1
        )

    def reader(self, spark, root, all_inputs):
        from esmarc_spark.ops.dedup_incremental import incremental_survivors

        return incremental_survivors(
            spark, root, self.d1 if not all_inputs else self.d1.unionByName(self.d2)
        ).select("doc_id")

    def from_scratch(self, spark):
        from esmarc_spark.ops.dedup import dedup_corpus

        return dedup_corpus(
            self.d1.unionByName(self.d2), threshold=0.5
        ).select("doc_id")


class LineStore:
    name = "lines"

    def setup(self, spark):
        def docs(lo, hi):
            return spark.range(lo, hi).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    "\n",
                    F.lit("SHARED NAV"),
                    F.concat(F.lit("body "), F.col("id").cast("string")),
                    F.concat(F.lit("foot "), (F.col("id") % 3).cast("string")),
                ).alias("text"),
            )

        self.d1 = docs(0, 30)
        self.d2 = docs(30, 60)

    def state_cls(self):
        from esmarc_spark.ops.line_dedup import LineFreqState

        return LineFreqState

    def commit1(self, spark, root):
        from esmarc_spark.ops.line_dedup import dedup_lines_incremental_dump

        return dedup_lines_incremental_dump(spark, self.d1, root, "d1", min_docs=3)

    def commit2(self, spark, root):
        from esmarc_spark.ops.line_dedup import dedup_lines_incremental_dump

        return dedup_lines_incremental_dump(spark, self.d2, root, "d2", min_docs=3)

    def reader(self, spark, root, all_inputs):
        from esmarc_spark.ops.line_dedup import LineFreqState

        return LineFreqState(root).counts(spark)

    def from_scratch(self, spark):
        from esmarc_spark.ops.line_dedup import remove_duplicate_lines

        return remove_duplicate_lines(
            self.d1.unionByName(self.d2), min_docs=3
        ).select("doc_id", "kept_lines")


class LinkGraphStore:
    name = "linkgraph"

    def setup(self, spark):
        def pages(lo, hi):
            d = F.col("id")
            return spark.range(lo, hi).select(
                F.concat(
                    F.lit("https://h"), F.pmod(d, F.lit(13)).cast("string"),
                    F.lit(".example/p/"), d.cast("string"),
                ).alias("url"),
                F.concat(
                    F.lit('<a href="https://h'),
                    F.pmod(d * 7 + 3, F.lit(13)).cast("string"),
                    F.lit('.example/x">a</a>'),
                ).alias("html"),
            )

        self.d1 = pages(0, 40)
        self.d2 = pages(40, 80)

    def state_cls(self):
        from esmarc_spark.ops.linkgraph_incremental import LinkGraphState

        return LinkGraphState

    def commit1(self, spark, root):
        from esmarc_spark.ops.linkgraph_incremental import ingest_pages_dump

        return ingest_pages_dump(spark, self.d1, root, "d1")

    def commit2(self, spark, root):
        from esmarc_spark.ops.linkgraph_incremental import ingest_pages_dump

        return ingest_pages_dump(spark, self.d2, root, "d2")

    def reader(self, spark, root, all_inputs):
        from esmarc_spark.ops.linkgraph_incremental import LinkGraphState

        return LinkGraphState(root).ranks(spark)

    def from_scratch(self, spark):
        from esmarc_spark.ops.linkgraph import host_pagerank

        return host_pagerank(self.d1.unionByName(self.d2), iterations=5)


STORES = [DedupStore, LineStore, LinkGraphStore]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("uri", [False, True], ids=["posix", "file-uri"])
@pytest.mark.parametrize("store_cls", STORES, ids=[s.name for s in STORES])
def test_crashed_writer_concurrent_reader_replay(
    spark, tmp_path, monkeypatch, store_cls, uri
):
    store = store_cls()
    store.setup(spark)
    root = f"file://{tmp_path}/state" if uri else str(tmp_path / "state")
    store.commit1(spark, root)
    cls = store.state_cls()
    manifest_before = cls(root).manifest()
    # concurrent reader: lazy frame taken from the COMMITTED state
    reader = store.reader(spark, root, all_inputs=False)
    snapshot = _rows(reader)

    # writer crashes after data writes, before the marker
    real = cls._publish
    monkeypatch.setattr(
        cls,
        "_publish",
        lambda self, *a, **k: (_ for _ in ()).throw(
            OSError("injected crash before marker")
        ),
    )
    with pytest.raises(OSError, match="injected crash"):
        store.commit2(spark, root)
    # no commit happened...
    assert cls(root).manifest() == manifest_before
    # ...and the concurrent reader still sees exactly the old state
    assert _rows(store.reader(spark, root, all_inputs=False)) == snapshot

    # healing replay overwrites orphan dirs deterministically
    monkeypatch.setattr(cls, "_publish", real)
    store.commit2(spark, root)
    assert len(cls(root).manifest()["dumps"]) == 2
    # the pre-crash lazy frame STILL collects its old snapshot (version
    # dirs are immutable until vacuum)
    assert _rows(reader) == snapshot


@pytest.mark.parametrize("store_cls", STORES, ids=[s.name for s in STORES])
def test_replay_equals_from_scratch_after_crash(spark, tmp_path, monkeypatch, store_cls):
    """After the crash + heal cycle the cumulative result is the same as
    never having crashed (compared to the from-scratch computation where
    the store defines one)."""
    store = store_cls()
    store.setup(spark)
    root = str(tmp_path / "state")
    store.commit1(spark, root)
    cls = store.state_cls()
    real = cls._publish
    monkeypatch.setattr(
        cls,
        "_publish",
        lambda self, *a, **k: (_ for _ in ()).throw(OSError("crash")),
    )
    with pytest.raises(OSError):
        store.commit2(spark, root)
    monkeypatch.setattr(cls, "_publish", real)
    out2 = store.commit2(spark, root)
    if store.name == "dedup":
        got = _rows(store.reader(spark, root, all_inputs=True))
        assert got == _rows(store.from_scratch(spark))
    elif store.name == "lines":
        from esmarc_spark.ops.line_dedup import dedup_lines_incremental_dump

        # cleaned dump-2 must equal cleaning dump 2 against the global
        # frequency state (the equality contract), replay-idempotent
        again = dedup_lines_incremental_dump(
            spark, store.d2, root, "d2", min_docs=3
        )
        assert _rows(out2.select("doc_id", "kept_lines")) == _rows(
            again.select("doc_id", "kept_lines")
        )
        scratch = {
            t[0]: t[1] for t in _rows(store.from_scratch(spark))
        }
        for doc_id, kept in _rows(out2.select("doc_id", "kept_lines")):
            assert scratch[doc_id] == kept
    else:
        assert _rows(out2) == _rows(store.from_scratch(spark))
