"""Deterministic KG negative sampling (ops/kg_negatives.py)."""

import duckdb
from pyspark.sql import functions as F

from esmarc_spark.ops.kg_negatives import (
    entity_ids,
    negative_samples,
    negative_samples_sql,
)


def _positives(spark, n_docs=40, n_ents=12):
    rows = []
    for d in range(n_docs):
        for j in range(1 + d % 3):
            rows.append((f"doc://{d}", "mentions", f"ent://{(d * 7 + j * 5) % n_ents}"))
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_entity_ids_bijection(spark):
    vocab = spark.createDataFrame(
        [(f"ent://{i}",) for i in range(57)], "obj string"
    )
    ids = entity_ids(vocab, "obj", n_buckets=8).collect()
    assert sorted(r.ent_id for r in ids) == list(range(57))
    assert len({r.entity for r in ids}) == 57


def test_negatives_never_true_edges_and_bounded(spark):
    pos = _positives(spark)
    neg = negative_samples(pos, k=3).collect()
    true_edges = {(r.subj, r.pred, r.obj) for r in pos.collect()}
    assert neg, "sampler produced nothing"
    for r in neg:
        assert (r.subj, r.pred, r.obj_neg) not in true_edges
        assert 0 <= r.neg_idx < 3
    # (positive edge, draw index) is a unique key; <= k rows per positive
    from collections import Counter

    per_draw = Counter((r.subj, r.pred, r.obj, r.neg_idx) for r in neg)
    assert max(per_draw.values()) == 1
    per_pos = Counter((r.subj, r.pred, r.obj) for r in neg)
    assert max(per_pos.values()) <= 3
    # every emitted source edge really is a positive
    for r in neg:
        assert (r.subj, r.pred, r.obj) in true_edges


def test_negatives_partitioning_invariant(spark):
    pos = _positives(spark)
    a = sorted(map(tuple, negative_samples(pos, k=2).collect()))
    b = sorted(
        map(tuple, negative_samples(pos.repartition(13), k=2).collect())
    )
    assert a == b


def test_negatives_oracle_parity(spark):
    pos = _positives(spark, n_docs=25)
    got = sorted(map(tuple, negative_samples(pos, k=2, n_buckets=16).collect()))
    vals = ", ".join(
        f"('{s}', '{p}', '{o}')" for s, p, o in sorted(
            {(r.subj, r.pred, r.obj) for r in pos.collect()}
        )
    )
    sql = negative_samples_sql(
        f"SELECT * FROM (VALUES {vals}) AS p(subj, pred, obj)", k=2, n_buckets=16
    )
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want
