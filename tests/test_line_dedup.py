"""Cross-document line-level dedup: semantics + DuckDB oracle parity."""

import duckdb
import pytest

from esmarc_spark.ops.line_dedup import (
    duplicate_line_keys,
    remove_duplicate_lines,
    remove_duplicate_lines_sql,
)


def _docs(spark):
    rows = [
        (1, "NAV HOME ABOUT\nunique body one\nCOPYRIGHT 2026"),
        (2, "NAV HOME ABOUT\nunique body two\nCOPYRIGHT 2026"),
        (3, "NAV HOME ABOUT\nunique body three"),
        # within-doc repetition only: must NOT be removed at min_docs=2
        (4, "solo line repeated\nsolo line repeated\nanother body"),
        # doc that is boilerplate-only: reduced to empty, row kept
        (5, "NAV HOME ABOUT\nCOPYRIGHT 2026"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_remove_duplicate_lines_semantics(spark):
    got = {
        r.doc_id: (r.text, r.kept_lines)
        for r in remove_duplicate_lines(_docs(spark), min_docs=2).collect()
    }
    assert got[1] == ("unique body one", 1)
    assert got[2] == ("unique body two", 1)
    assert got[3] == ("unique body three", 1)
    # repeated within ONE doc survives (distinct-doc counting)
    assert got[4] == ("solo line repeated\nsolo line repeated\nanother body", 3)
    assert got[5] == ("", 0)  # boilerplate-only doc keeps its row
    assert got[6] == ("", 0)


def test_duplicate_line_keys_counts(spark):
    freq = {r.n_docs for r in duplicate_line_keys(_docs(spark), 2).collect()}
    assert freq == {4, 3}  # NAV in docs 1,2,3,5; COPYRIGHT in 1,2,5


def test_line_dedup_duckdb_parity(spark):
    rows = [
        (i, "\n".join(
            ["SHARED HEADER"]
            + [f"body {i} part {j}" for j in range(3)]
            + ([f"footer {i % 4}"])
        ))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.text, r.kept_lines)
        for r in remove_duplicate_lines(docs, min_docs=2).collect()
    )
    vals = ", ".join(f"({i}, '{t}')".replace("\n", "' || chr(10) || '") for i, t in rows)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            remove_duplicate_lines_sql(
                f"SELECT * FROM (VALUES {vals}) AS d(doc_id, text)", 2
            )
        ).fetchall()
    )
    assert got == want
    # every doc lost exactly the header and its shared footer
    assert all(k == 3 for _, _, k in got)


def _dump(spark, ids, shared, unique_prefix):
    rows = [
        (i, f"{shared}\n{unique_prefix} body {i}\ncommon across dumps")
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_equals_from_scratch(spark, tmp_path):
    """Cleaning dump k against the accumulated index must equal cleaning
    dump k's docs with from-scratch counts over dumps 1..k."""
    from esmarc_spark.ops.line_dedup import (
        dedup_lines_incremental_dump,
        duplicate_line_keys,
        _strip_lines,
    )

    root = str(tmp_path / "linestate")
    d1 = _dump(spark, range(0, 30), "HEADER A", "d1")
    d2 = _dump(spark, range(30, 60), "HEADER A", "d2")
    d3 = _dump(spark, range(60, 90), "HEADER B", "d3")

    outs = {}
    for name, d in [("d1", d1), ("d2", d2), ("d3", d3)]:
        outs[name] = sorted(
            map(tuple, dedup_lines_incremental_dump(spark, d, root, name).collect())
        )

    # from-scratch: counts over the cumulative corpus, stripped from the
    # newest dump's docs only
    for name, d, cum in [("d1", d1, d1), ("d2", d2, d1.union(d2)),
                         ("d3", d3, d1.union(d2).union(d3))]:
        keys = duplicate_line_keys(cum, 2).select("lk")
        want = sorted(map(tuple, _strip_lines(d, keys, "text").collect()))
        assert outs[name] == want, name

    # semantics spot checks: "common across dumps" repeats inside EVERY
    # dump so it is stripped from d1 already; HEADER A reaches d3 only
    # through history (no doc in d3 carries it -> nothing to strip);
    # HEADER B repeats within d3 -> stripped there
    assert all("common across" not in t for _, t, _ in outs["d1"])
    assert all("HEADER B" not in t for _, t, _ in outs["d3"])
    assert all(t.startswith("d3 body") for _, t, _ in outs["d3"])


def test_incremental_replay_idempotent(spark, tmp_path):
    from esmarc_spark.ops.line_dedup import LineFreqState, dedup_lines_incremental_dump

    root = str(tmp_path / "linestate")
    d1 = _dump(spark, range(0, 20), "HEADER A", "d1")
    a = sorted(map(tuple, dedup_lines_incremental_dump(spark, d1, root, "d1").collect()))
    b = sorted(map(tuple, dedup_lines_incremental_dump(spark, d1, root, "d1").collect()))
    assert a == b
    assert LineFreqState(root).manifest()["dumps"] == ["d1"]


def test_incremental_crash_before_publish(spark, tmp_path):
    """Counts dir written but marker missing: manifest stays at the prior
    commit; the retry overwrites the orphan and commits."""
    from esmarc_spark.ops.line_dedup import (
        LineFreqState,
        duplicate_line_keys,
    )
    from esmarc_spark.ops.line_dedup import dedup_lines_incremental_dump

    root = str(tmp_path / "linestate")
    d1 = _dump(spark, range(0, 20), "HEADER A", "d1")
    # simulate the crash: counts land, _STATE never written
    duplicate_line_keys(d1, 1).write.mode("overwrite").parquet(
        f"{root}/counts/dump=d1"
    )
    assert LineFreqState(root).manifest()["dumps"] == []
    dedup_lines_incremental_dump(spark, d1, root, "d1")
    assert LineFreqState(root).manifest()["dumps"] == ["d1"]
