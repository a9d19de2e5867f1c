"""SemDeDup semantics (keep-lowest-id survivor, deterministic
assignment ties) + DuckDB oracle parity."""

import duckdb

from esmarc_spark.ops.semdedup import assign_clusters, semdedup, semdedup_sql


def _emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),  # centroid seed 1
        (1, [0.0, 1.0, 0.0, 0.0]),  # centroid seed 2
        (2, [1.0, 1.0, 0.0, 0.0]),  # exact tie -> lowest cluster id
        (5, [0.6, 0.8, 0.0, 0.0]),  # near-dup group in cluster 2 ...
        (6, [0.6001, 0.8, 0.0, 0.0]),  # ... lowest id (5) survives
        (9, [0.0, 0.0, 1.0, 0.0]),  # unique direction: kept
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_keep_lowest_id(spark):
    got = {
        r.vec_id: (r.cluster_id, r.keep)
        for r in semdedup(_emb(spark), n_clusters=2, threshold=0.99).collect()
    }
    assert got[5][1] is True and got[6][1] is False  # group survivor = min id
    assert got[5][0] == got[6][0]  # dup decided within one cluster
    assert got[0][1] and got[1][1] and got[2][1] and got[9][1]


def test_assignment_tie_breaks_to_lowest_cluster(spark):
    from esmarc_spark.ops.similarity import ivf_build

    cents = ivf_build(_emb(spark), n_centroids=2, iters=0)
    got = {
        r.vec_id: r.cluster_id
        for r in assign_clusters(_emb(spark), cents).collect()
    }
    # vec 2 has identical cosine to both centroids -> cluster 1
    assert got[2] == 1
    assert got[0] == 1 and got[1] == 2


def test_lloyd_refinement_path_runs(spark):
    out = semdedup(_emb(spark), n_clusters=2, threshold=0.99, iters=2)
    assert out.count() == 6
    assert set(out.columns) == {"vec_id", "cluster_id", "keep"}


def test_oracle_parity_corpus(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    got = (
        semdedup(emb, n_clusters=8, threshold=0.35)
        .orderBy("vec_id")
        .collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf}/embeddings.parquet')"
    )
    want = con.sql(semdedup_sql(8, 0.35) + " ORDER BY vec_id").fetchall()
    assert [(r.vec_id, r.cluster_id, r.keep) for r in got] == [
        tuple(w) for w in want
    ]
    assert any(not r.keep for r in got)  # the threshold actually prunes
