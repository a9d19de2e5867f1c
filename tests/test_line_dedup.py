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
