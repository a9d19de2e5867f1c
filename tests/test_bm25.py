"""BM25 retrieval (ops/bm25.py): exactness vs an independent
pure-Python scorer, edge semantics, and parallelism-independence."""

import math

from esmarc_spark.ops.bm25 import bm25_topk

K1, B = 1.2, 0.75


def _py_bm25(docs: list[tuple[int, str]], query: str, k1=K1, b=B):
    """Independent reference: classic loops, same formula + rounding."""
    toked = []
    for did, t in docs:
        if t is None:
            continue
        toks = [x for x in t.lower().split(" ") if x]
        if toks:
            toked.append((did, toks))
    n = len(toked)
    avgdl = sum(len(t) for _, t in toked) / n
    qterms = sorted(set(x for x in query.lower().split(" ") if x))
    df = {
        q: sum(1 for _, t in toked if q in t) for q in qterms
    }
    out = {}
    for did, toks in toked:
        s = 0.0
        for q in qterms:
            tf = toks.count(q)
            if tf == 0 or df[q] == 0:
                continue
            idf = round(math.log((n - df[q] + 0.5) / (df[q] + 0.5) + 1.0), 9)
            tfn = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(toks) / avgdl))
            s += round(idf * tfn, 9)
        if s:
            out[did] = round(s, 6)
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


def test_matches_python_reference(spark):
    docs = [
        (1, "spark shuffle join join join table"),
        (2, "table table table scan"),
        (3, "join table"),
        (4, "completely unrelated words here"),
        (5, None),
        (6, "   "),
        (7, "join " * 50 + "tail"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = bm25_topk(df, [("q", "join table")], k=10).collect()
    want = _py_bm25(docs, "join table")
    assert [(r["doc_id"], r["score"]) for r in got] == want
    assert [r["rnk"] for r in got] == list(range(1, len(want) + 1))


def test_ties_break_on_doc_id_and_k_respected(spark):
    # identical docs -> identical scores -> ascending doc_id order
    docs = [(i, "alpha beta gamma") for i in (5, 3, 9, 1)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = bm25_topk(df, [("q", "alpha")], k=3).collect()
    assert [r["doc_id"] for r in got] == [1, 3, 5]
    scores = {r["score"] for r in got}
    assert len(scores) == 1


def test_parallelism_independent(spark):
    import duckdb

    rows = duckdb.sql(
        "SELECT doc_id, text FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchall()
    df1 = spark.createDataFrame(rows, "doc_id long, text string")
    df8 = df1.repartition(8)
    q = [("a", "table scan"), ("b", "window join merge")]
    r1 = [tuple(r) for r in bm25_topk(df1, q, k=15).collect()]
    r8 = [tuple(r) for r in bm25_topk(df8, q, k=15).collect()]
    assert r1 == r8 and len(r1) == 30
