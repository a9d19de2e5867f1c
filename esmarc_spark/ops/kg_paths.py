"""Property-path traversal over (subj, pred, obj) triples — the
2-hop join every KG consumer runs first (page -> mentions -> entity ->
sameAs -> authority URI resolves a crawled page straight to GND/
Wikidata identifiers; reference analogue: esmarc's sameAs chains,
esmarc.py getentity -> gnd2uri, which this repo re-expresses
relationally in pipeline/link.py).

Scale shape: a 2-hop path is one equi-join on the shared middle node.
Its cost per mid key is indegree(p1) x outdegree(p2) — web-scale KGs
are Zipf graphs where one hub entity (a country, a famous person) can
carry 10^7 of each, so the naive join explodes quadratically on
exactly the keys that matter least for path queries. The guard is the
same move as ``ops.linkgraph.count_triangles``: bound the per-key
fan-out EXPLICITLY (``max_mid_in`` / ``max_mid_out``) by dropping hub
middles, computed with partial-agg degree counts before the join. The
cap is part of the operator's declared semantics (excluded hubs are a
documented recall tradeoff, not silent truncation) and the oracle
replays it, so capped results stay hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_hop_paths(
    triples: DataFrame,
    pred1: str,
    pred2: str,
    max_mid_in: int | None = None,
    max_mid_out: int | None = None,
) -> DataFrame:
    """Distinct (subj, mid, obj) with subj -[pred1]-> mid -[pred2]-> obj.
    ``max_mid_in`` / ``max_mid_out`` drop middle nodes whose pred1
    indegree / pred2 outdegree exceeds the cap (hub guard; None = no
    cap)."""
    t1 = triples.where(F.col("pred") == pred1).select(
        "subj", F.col("obj").alias("mid")
    )
    t2 = triples.where(F.col("pred") == pred2).select(
        F.col("subj").alias("mid"), "obj"
    )
    if max_mid_in is not None:
        ok_in = (
            t1.groupBy("mid")
            .agg(F.count(F.lit(1)).alias("_d"))
            .where(F.col("_d") <= max_mid_in)
            .select("mid")
        )
        t1 = t1.join(ok_in, "mid", "semi")
    if max_mid_out is not None:
        ok_out = (
            t2.groupBy("mid")
            .agg(F.count(F.lit(1)).alias("_d"))
            .where(F.col("_d") <= max_mid_out)
            .select("mid")
        )
        t2 = t2.join(ok_out, "mid", "semi")
    return t1.join(t2, "mid").select("subj", "mid", "obj").distinct()


def two_hop_paths_sql(
    triples_sql: str,
    pred1: str,
    pred2: str,
    max_mid_in: int | None = None,
    max_mid_out: int | None = None,
) -> str:
    """DuckDB replay: identical degree caps and join."""
    in_gate = (
        f"""WHERE mid IN (SELECT mid FROM _e1
                GROUP BY mid HAVING COUNT(*) <= {max_mid_in})"""
        if max_mid_in is not None
        else ""
    )
    out_gate = (
        f"""WHERE mid IN (SELECT mid FROM _e2
                GROUP BY mid HAVING COUNT(*) <= {max_mid_out})"""
        if max_mid_out is not None
        else ""
    )
    return f"""
WITH _t AS ({triples_sql}),
_e1 AS (SELECT subj, obj AS mid FROM _t WHERE pred = '{pred1}'),
_e2 AS (SELECT subj AS mid, obj FROM _t WHERE pred = '{pred2}'),
_t1 AS (SELECT * FROM _e1 {in_gate}),
_t2 AS (SELECT * FROM _e2 {out_gate})
SELECT DISTINCT t1.subj, t1.mid, t2.obj
FROM _t1 t1 JOIN _t2 t2 USING (mid)
"""
