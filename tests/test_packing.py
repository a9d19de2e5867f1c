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


def test_shard_manifest_detects_tampering(spark):
    """The manifest digest changes when a doc is dropped, duplicated,
    or moved between shards — and is partition-invariant."""
    import duckdb

    from pyspark.sql import functions as F

    from esmarc_spark.ops.packing import (
        assign_token_shards,
        assign_token_shards_sql,
        shard_manifest,
        shard_manifest_sql,
    )

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.pmod("id", F.lit(50)) + 10).alias("n_tokens")
    )
    shards = assign_token_shards(docs, budget=500, bucket=32)
    m = {r["shard"]: tuple(r) for r in shard_manifest(shards).collect()}
    m2 = {
        r["shard"]: tuple(r)
        for r in shard_manifest(shards.repartition(13)).collect()
    }
    assert m == m2 and len(m) > 3
    # drop one doc: its shard's digest and counts change, others don't
    victim = shards.where(F.col("doc_id") == 137).collect()[0]
    tampered = {
        r["shard"]: tuple(r)
        for r in shard_manifest(shards.where(F.col("doc_id") != 137)).collect()
    }
    assert tampered[victim["shard"]] != m[victim["shard"]]
    assert all(
        tampered[s] == m[s] for s in m if s != victim["shard"]
    )
    # duplicating a doc also shows
    dup = shard_manifest(shards.unionAll(shards.where(F.col("doc_id") == 7)))
    assert {r["shard"]: tuple(r) for r in dup.collect()} != m
    # oracle parity
    con = duckdb.connect()
    con.register("d", docs.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(
            shard_manifest_sql(
                assign_token_shards_sql("SELECT * FROM d", 500)
            )
        ).fetchall()
    )
    assert sorted(m.values()) == want
