"""DSIR importance resampling: semantics + DuckDB oracle parity."""

import duckdb

from esmarc_spark.ops.dsir import (
    dsir_sample,
    dsir_sample_sql,
    dsir_weights,
    raw_unigram_counts,
)


def _docs(spark):
    # one document overrepresented in the raw corpus, one rare; both use
    # tokens absent from the vendored target model, so the importance
    # ratio is driven purely by the raw-frequency penalty
    rows = [(i, "zzqxaa zzqxbb") for i in range(20)]
    rows.append((100, "zzqxcc zzqxdd"))
    rows.append((101, ""))
    rows.append((102, None))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_overrepresented_source_text_is_downweighted(spark):
    got = {
        r.doc_id: r.dsir_logratio for r in dsir_weights(_docs(spark)).collect()
    }
    assert got[0] < got[100]  # frequent doc penalized vs rare doc
    assert got[101] is None and got[102] is None


def test_gumbel_noise_is_deterministic_per_text(spark):
    out = dsir_weights(_docs(spark)).collect()
    scores = {}
    for r in out:
        scores.setdefault(r.text, set()).add(r.dsir_gumbel_score)
    # identical text -> identical deterministic noise -> identical score
    assert len(scores["zzqxaa zzqxbb"]) == 1


def test_raw_counts_total_matches_token_count(spark):
    counts, total = raw_unigram_counts(_docs(spark))
    assert total == 20 * 2 + 2
    assert sum(counts) == total


def test_sample_rank_and_oracle_parity(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    _docs(spark).write.mode("overwrite").parquet(p)
    got = dsir_sample(spark.read.parquet(p), m=5).collect()
    assert [r.rank for r in got] == [1, 2, 3, 4, 5]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    want = con.sql(
        dsir_sample_sql("SELECT doc_id, text FROM documents", 5)
    ).fetchall()
    assert [
        (r.rank, r.doc_id, r.dsir_logratio, r.dsir_gumbel_score) for r in got
    ] == [tuple(w) for w in want]
