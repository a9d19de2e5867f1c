"""ExactSubstr-style span dedup: semantics + DuckDB oracle parity."""

import duckdb

from esmarc_spark.ops.span_dedup import (
    duplicated_span_seeds,
    remove_duplicate_spans,
    remove_duplicate_spans_sql,
)

# a 13-token boilerplate run shared by two documents
_SPAN = " ".join(f"w{i}" for i in range(13))


def _docs(spark):
    rows = [
        (1, f"alpha one {_SPAN} enda one"),
        (2, f"beta two two {_SPAN} endb two"),
        (3, "gamma entirely unique text with no duplicated run at all"),
        (4, "short doc"),  # shorter than k: no shingles, untouched
        (5, None),  # null text propagates
        # within-doc repetition of the same span counts toward min_count
        (6, f"{_SPAN} middle {_SPAN}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_duplicate_spans_semantics(spark):
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in remove_duplicate_spans(_docs(spark), k=13).collect()
    }
    # the shared run is cut in full from both docs, surroundings kept
    assert got[1] == ("alpha one enda one", 13)
    assert got[2] == ("beta two two endb two", 13)
    assert got[3] == (
        "gamma entirely unique text with no duplicated run at all",
        0,
    )
    assert got[4] == ("short doc", 0)
    assert got[5] == (None, 0)
    # self-duplication removes BOTH occurrences (ExactSubstr semantics)
    assert got[6] == ("middle", 26)


def test_long_shared_run_removed_contiguously(spark):
    # a 20-token shared run: every 13-window inside it is duplicated, so
    # coverage is the full 20 tokens — nothing of the run survives
    run = " ".join(f"r{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, f"head {run} tail"), (2, f"x {run} y")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_removed_tokens)
        for r in remove_duplicate_spans(docs, k=13).collect()
    }
    assert got[1] == ("head tail", 20)
    assert got[2] == ("x y", 20)


def test_seeds_are_one_based_starts(spark):
    seeds = {
        (r.doc_id, r.seed)
        for r in duplicated_span_seeds(_docs(spark), k=13).collect()
    }
    # doc 1: span starts at token 3 (1-based); doc 6: positions 1 and 15
    assert (1, 3) in seeds
    assert (6, 1) in seeds and (6, 15) in seeds


def test_oracle_parity_small_and_corpus(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    _docs(spark).write.mode("overwrite").parquet(p)
    got = (
        remove_duplicate_spans(spark.read.parquet(p), k=13)
        .select("doc_id", "clean_text", "n_removed_tokens")
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = con.sql(
        remove_duplicate_spans_sql("SELECT * FROM documents", k=13)
        + " ORDER BY doc_id"
    ).df()
    assert list(got.doc_id) == list(want.doc_id)
    for a, b in zip(got.itertuples(index=False), want.itertuples(index=False)):
        assert (a[1] == b[1]) or (a[1] is None and b[1] is None)
        assert a[2] == b[2]
