"""Bad-words gate + host-level quality rollup: semantics + oracle parity."""

import duckdb
import pytest

from esmarc_spark.ops.badwords import (
    badword_pattern,
    badword_stats,
    badword_stats_sql,
)
from esmarc_spark.ops.host_rollup import (
    gate_hosts_by_quality,
    host_quality_rollup,
    host_quality_rollup_sql,
)


def test_badwords_word_boundary_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "win the JACKPOT now"),  # case-insensitive hit
            (2, "the casino! opened"),  # punctuation boundary hit
            (3, "cassino is a town in italy"),  # superstring: NOT a hit
            (4, "clean text entirely"),
            (5, None),
            (6, "porn porn porn"),  # counted per occurrence
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.badword_count, r.keep)
        for r in badword_stats(docs).collect()
    }
    assert got[1] == (1, False)
    assert got[2] == (1, False)
    assert got[3] == (0, True)
    assert got[4] == (0, True)
    assert got[5] == (0, True)
    assert got[6] == (3, False)


def test_badwords_pattern_rejects_regex_metachars():
    with pytest.raises(ValueError):
        badword_pattern(["a.b"])


def test_badwords_oracle_parity(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "jackpot casino xxx"), (2, "fine text"), (3, None)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(p)
    got = (
        badword_stats(spark.read.parquet(p))
        .select("doc_id", "badword_count", "keep")
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = con.sql(
        "SELECT doc_id, badword_count, keep FROM ("
        + badword_stats_sql("SELECT * FROM documents")
        + ") ORDER BY doc_id"
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]


def _hosted(spark):
    rows = [
        # host A: long diverse sentences with stopwords -> high quality
        (i, "a", "the quick brown fox jumps over the lazy dog number "
         + " ".join(f"t{i}x{j}" for j in range(10)))
        for i in range(4)
    ] + [
        # host B: short low-diversity junk -> low quality
        (10 + i, "b", "spam spam spam") for i in range(4)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_host_rollup_gates_low_quality_host(spark):
    roll = {
        r.host: (r.n_docs, r.keep)
        for r in host_quality_rollup(_hosted(spark)).collect()
    }
    assert roll["a"] == (4, True)
    assert roll["b"] == (4, False)
    kept = gate_hosts_by_quality(_hosted(spark))
    assert {r.source for r in kept.collect()} == {"a"}
    assert kept.count() == 4


def test_host_rollup_oracle_parity(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    _hosted(spark).write.mode("overwrite").parquet(p)
    got = (
        host_quality_rollup(spark.read.parquet(p))
        .orderBy("host")
        .collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = con.sql(
        host_quality_rollup_sql("SELECT * FROM documents") + " ORDER BY host"
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]


def test_prepare_docs_badwords_and_span_knobs(spark):
    import datetime as dt

    import pytest as _pt

    from esmarc_spark.pipeline.run import prepare_docs

    t0 = dt.datetime(2024, 5, 1)
    span = " ".join(f"s{i}" for i in range(13))
    rows = [
        ("https://a.example/1", t0,
         f"<p>unique alpha {span} tail-a</p>".encode(), None, "en"),
        ("https://a.example/2", t0,
         f"<p>unique beta {span} tail-b</p>".encode(), None, "en"),
        ("https://a.example/3", t0,
         b"<p>win the casino jackpot tonight</p>", None, "en"),
        ("https://a.example/4", t0,
         b"<p>perfectly clean page body</p>", None, "en"),
    ]
    wt = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    docs = {
        r.url: r.text
        for r in prepare_docs(
            wt, dedup_spans_k=13, badword_list=True
        ).collect()
    }
    assert "https://a.example/3" not in docs  # badword page dropped
    assert "https://a.example/4" in docs
    # the shared 13-token run is cut from both survivors
    assert span not in docs["https://a.example/1"]
    assert "unique alpha" in docs["https://a.example/1"]
    assert span not in docs["https://a.example/2"]

    with _pt.raises(ValueError):
        prepare_docs(wt, dedup_spans_k=13, url_dedup=False)


def test_prepare_docs_mojibake_repair_knob(spark):
    import datetime as dt

    from esmarc_spark.pipeline.run import prepare_docs

    t0 = dt.datetime(2024, 5, 1)
    rows = [
        # html carries the corrupted bytes (already UTF-8 of the mojibake
        # chars — the damage is baked into the source, S1 can't help)
        ("https://a.example/1", t0,
         "<p>visit the cafÃ© â€” naÃ¯ve quote â€œhiâ€\x9d</p>".encode(),
         None, "en"),
        ("https://a.example/2", t0, b"<p>plain ascii page</p>", None, "en"),
    ]
    wt = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    off = {r.url: r.text for r in prepare_docs(wt).collect()}
    on = {r.url: r.text for r in prepare_docs(wt, mojibake_repair=True).collect()}
    assert "cafÃ©" in off["https://a.example/1"]  # default keeps bytes as-is
    assert "café — naïve quote “hi”" in on["https://a.example/1"]
    assert on["https://a.example/2"] == off["https://a.example/2"]  # untouched
