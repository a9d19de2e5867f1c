"""Token-budget sharding: distributed prefix sum vs sequential truth."""

import duckdb

from esmarc_spark.ops.packing import assign_token_shards, assign_token_shards_sql


def _rows(n):
    # varied, deterministic token counts incl. zero-token docs
    return [(i, (i * 7919) % 950 + (0 if i % 17 else 0)) for i in range(n)]


def test_assign_token_shards_matches_sequential(spark):
    rows = _rows(1000)
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    # bucket=64 forces many buckets -> the distributed path is exercised
    got = {
        r.doc_id: (r.tokens_before, r.shard)
        for r in assign_token_shards(df, budget=10_000, bucket=64).collect()
    }
    run = 0
    for i, t in rows:
        assert got[i] == (run, run // 10_000)
        run += t


def test_assign_token_shards_duckdb_parity(spark):
    rows = _rows(500)
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted(
        tuple(r) for r in assign_token_shards(df, 7_000, bucket=32).collect()
    )
    vals = ", ".join(f"({i}, {t})" for i, t in rows)
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            assign_token_shards_sql(
                f"SELECT * FROM (VALUES {vals}) AS d(doc_id, n_tokens)", 7_000
            )
        ).fetchall()
    )
    assert got == want


def test_shards_are_token_balanced(spark):
    rows = _rows(2000)
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    budget = 25_000
    shards = (
        assign_token_shards(df, budget, bucket=128)
        .groupBy("shard")
        .sum("n_tokens")
        .collect()
    )
    totals = {r["shard"]: r["sum(n_tokens)"] for r in shards}
    max_doc = max(t for _, t in rows)
    for s, tot in totals.items():
        if s != max(totals):  # all but the last shard are filled
            assert budget - max_doc < tot <= budget + max_doc
