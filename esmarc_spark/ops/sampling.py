"""Deterministic sampling and corpus mixing — the data-mixture step of
a training pipeline (per-source/per-language rates), as pure codegen.

``df.sample()`` is seed-and-partitioning dependent; these samplers hash
a KEY, so membership is a pure function of the row — stable across
reruns, partitionings, cluster sizes, and engines. The hash is the
repo's portable cross-engine hash (md5 prefix as a 60-bit integer:
Spark ``conv(substr(md5(k),1,15),16,10)`` == DuckDB
``cast('0x'||substr(md5(k),1,15) as bigint)``), so the DuckDB oracle
selects the IDENTICAL rows, not merely the same expected counts.

Map-only, no shuffle; at scale this rides whatever scan is already
reading the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 1_000_000


def _portable_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from the portable 60-bit md5 hash."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(_DENOM))


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership decided by hash(key, salt)
    alone. Different salts give independent samples of the same table
    (train/held-out splits that never leak across reruns)."""
    return df.where(_portable_bucket(F.col(key), salt) < int(fraction * _DENOM))


def sample_stratified(
    df: DataFrame,
    key: str,
    stratum: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum rates (the mixing table of a training-data recipe):
    rows keep iff hash-bucket < rate[stratum]. Strata missing from
    ``fractions`` fall back to ``default_fraction``."""
    rate = F.lit(int(default_fraction * _DENOM))
    for value, frac in sorted(fractions.items()):
        rate = F.when(
            F.col(stratum) == value, F.lit(int(frac * _DENOM))
        ).otherwise(rate)
    return df.where(_portable_bucket(F.col(key), salt) < rate)


def _fdiv(a: Column, b: Column) -> Column:
    """Exact floor division for non-negative int64 (the linkgraph
    recipe: subtract the remainder first, so the double division is of
    an exact multiple)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def temperature_weights(
    counts: dict[str, int], temperature: float
) -> dict[str, float]:
    """Temperature-scaled mixture weights w_s = n_s^(1/T): T=1 keeps the
    natural mix, T->inf goes uniform (the multilingual-sampling recipe)."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    return {s: float(n) ** (1.0 / temperature) for s, n in counts.items()}


def source_mix_rates(
    counts: dict[str, int],
    weights: dict[str, float],
    target_total: int,
) -> dict[str, float]:
    """Per-source keep-fractions hitting ``target_total`` rows in
    expectation at mixture proportions ``weights`` (any positive
    relative weights; missing sources get 0). Rates are floored to ppm
    ints then returned as exact fractions, and capped at 1.0 — an
    underrepresented source cannot be oversampled by filtering; repeat
    epochs downstream handle that (documented, standard practice).

    Pure Python over the bounded per-source count dim; the result is
    the mixing table both engines share (the ``sample_stratified``
    single-source-of-truth contract), which keeps cross-engine parity
    independent of float ``pow`` behavior."""
    wsum = sum(weights.get(s, 0.0) for s in counts)
    if wsum <= 0:
        raise ValueError("weights must have positive mass on the sources")
    out = {}
    for s, n in counts.items():
        target_s = target_total * weights.get(s, 0.0) / wsum
        out[s] = min(_DENOM, int(target_s * _DENOM / n)) / _DENOM if n else 0.0
    return out


def sample_source_mix(
    df: DataFrame,
    key: str,
    source_col: str,
    weights: dict[str, float],
    target_total: int,
    salt: str = "",
) -> DataFrame:
    """Source-mixing resample with EXPLICIT weights: collect the
    per-source counts (a bounded dim — #sources, not #rows), derive ppm
    rates via :func:`source_mix_rates`, then hash-threshold membership
    (identical rows in any engine/partitioning). The pytest parity
    oracle feeds ``sample_stratified_sql`` the same rate table."""
    counts = {
        r["s"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rates = source_mix_rates(counts, weights, target_total)
    return sample_stratified(df, key, source_col, rates, 0.0, salt)


def sample_by_sqrt_temperature(
    df: DataFrame,
    key: str,
    source_col: str,
    target_total: int,
    salt: str = "",
) -> DataFrame:
    """Temperature-2 source mixing (w_s = sqrt(n_s) — the standard
    "dampen the head, lift the tail" multilingual mix), computed fully
    IN-ENGINE with no driver collect: counts are a groupBy dim, the
    weight total attaches via a broadcast one-row crossJoin, per-source
    ppm rates are exact integer floors, and membership is the portable
    hash threshold.

    Why sqrt and not pow(n, 1/T): IEEE-754 requires sqrt (and +,-,*,/)
    to be correctly rounded, so every engine computes bit-identical
    weights from the same counts — ``pow`` carries no such guarantee,
    which is why the general-T path (:func:`sample_source_mix`) shares
    a Python-computed rate table instead. This variant is the one whose
    DuckDB oracle recomputes everything from the raw table.

    Integer magnitudes: w = floor(sqrt(n)*1000) <= 1e9 for n <= 1e12;
    num = 1e6 * target_total * w stays under 2^63 for targets <= ~9e12.
    den = W * n_s can overflow int64 once sum-of-weights * max-source
    exceeds ~9e18 (≈ 10^5 sources of 10^12 docs) — cast the den pair
    through decimal(38,0) before going there."""
    counts = df.groupBy(F.col(source_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = counts.withColumn(
        "__w",
        F.floor(F.sqrt(F.col("__n").cast("double")) * 1000).cast("long"),
    )
    # NB: Spark resolution is case-insensitive — the total must not be
    # spelled "__W" or it collides with "__w"
    tot = w.agg(F.sum("__w").cast("long").alias("__wtot"))
    num = F.lit(_DENOM).cast("long") * F.lit(int(target_total)) * F.col("__w")
    den = F.col("__wtot") * F.col("__n")
    rates = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "__s",
            F.least(F.lit(_DENOM).cast("long"), _fdiv(num, den)).alias(
                "__rate_ppm"
            ),
        )
    )
    joined = df.join(
        F.broadcast(rates), df[source_col] == rates["__s"]
    ).where(_portable_bucket(F.col(key), salt) < F.col("__rate_ppm"))
    return joined.select(*[df[c] for c in df.columns])


def sample_by_sqrt_temperature_sql(
    source_select: str,
    key: str,
    source_col: str,
    target_total: int,
    salt: str = "",
) -> str:
    """DuckDB oracle for :func:`sample_by_sqrt_temperature`: recomputes
    counts -> sqrt weights -> exact integer rates -> hash membership
    from the raw relation (sqrt / * / floor all correctly rounded, integer
    sums order-free — bit-identical to the Spark side)."""
    num = f"({_DENOM} * {int(target_total)} * wi)"
    den = "(W * n)"
    return f"""
WITH _src AS ({source_select}),
_cnt AS (SELECT {source_col} AS s, COUNT(*) AS n FROM _src GROUP BY 1),
_w AS (SELECT s, n,
              CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000) AS BIGINT) AS wi
       FROM _cnt),
_tot AS (SELECT CAST(SUM(wi) AS BIGINT) AS W FROM _w),
_r AS (SELECT s,
              least({_DENOM}, CAST(({num} - {num} % {den}) / {den} AS BIGINT))
                AS rate_ppm
       FROM _w, _tot)
SELECT _src.* FROM _src JOIN _r ON _r.s = _src.{source_col}
WHERE {_bucket_sql(key, salt)} < _r.rate_ppm
"""


def _bucket_sql(key: str, salt: str) -> str:
    return (
        f"(cast('0x' || substr(md5(cast({key} AS varchar) || '{salt}'), 1, 15)"
        f" AS bigint) % {_DENOM})"
    )


def sample_stratified_sql(
    source_select: str,
    key: str,
    stratum: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> str:
    """DuckDB oracle: the identical hash-threshold selection."""
    whens = " ".join(
        f"WHEN '{v}' THEN {int(f * _DENOM)}"
        for v, f in sorted(fractions.items())
    )
    rate = f"CASE {stratum} {whens} ELSE {int(default_fraction * _DENOM)} END"
    return f"""
SELECT * FROM ({source_select})
WHERE {_bucket_sql(key, salt)} < {rate}
"""


# ---------------------------------------------------------------------------
# deterministic dataset splits
# ---------------------------------------------------------------------------


def _split_cuts(ratios: dict[str, float]) -> tuple[list[str], list[int]]:
    """Shared cut-point table (single source of truth for both engines):
    cumulative ppm thresholds in dict order; the LAST split absorbs the
    <1 ppm rounding remainder so every bucket is assigned."""
    if len(ratios) < 2:
        raise ValueError("need at least two splits")
    if abs(sum(ratios.values()) - 1.0) > 1e-9:
        raise ValueError("split ratios must sum to 1")
    names, cuts, acc = [], [], 0.0
    for name, frac in ratios.items():
        if frac <= 0:
            raise ValueError(f"split {name!r} has non-positive ratio")
        acc += frac
        names.append(name)
        cuts.append(int(round(acc * _DENOM)))
    cuts[-1] = _DENOM
    return names, cuts


def assign_split(
    df: DataFrame, key: str, ratios: dict[str, float], salt: str = ""
) -> DataFrame:
    """Train/val/test assignment as a pure function of hash(key, salt):
    a ``split`` column from cumulative hash-bucket cut points. Because
    membership depends on the row alone, the split is stable under
    resharding, re-runs, appends (new rows land in splits without
    moving old ones), and engines — eval rows can never leak into
    training when the corpus is re-partitioned, which is the property
    random splits lose. Map-only; the reference has no splitter (its
    corpora are whole-dump), this is training-pipeline surface."""
    names, cuts = _split_cuts(ratios)
    return df.withColumn("split", _split_case(F.col(key), names, cuts, salt))


def _split_case(key: Column, names: list[str], cuts: list[int], salt: str) -> Column:
    bucket = _portable_bucket(key, salt)
    col = F.when(bucket < cuts[0], F.lit(names[0]))
    for name, cut in zip(names[1:-1], cuts[1:-1]):
        col = col.when(bucket < cut, F.lit(name))
    return col.otherwise(F.lit(names[-1]))


def assign_split_sql(
    source_select: str, key: str, ratios: dict[str, float], salt: str = ""
) -> str:
    """DuckDB oracle: the identical cut-point CASE over the portable
    hash (cut table shared via :func:`_split_cuts`)."""
    names, cuts = _split_cuts(ratios)
    whens = " ".join(
        f"WHEN {_bucket_sql(key, salt)} < {cut} THEN '{name}'"
        for name, cut in zip(names[:-1], cuts[:-1])
    )
    return f"""
SELECT *, CASE {whens} ELSE '{names[-1]}' END AS split
FROM ({source_select})
"""


def assign_split_leakage_safe(
    documents: DataFrame,
    ratios: dict[str, float],
    salt: str = "",
    *,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Near-dup-cluster-consistent train/val/test assignment. A plain
    per-doc hash split lets two near-duplicate documents (template
    variants, boilerplate reprints) land in different splits — the eval
    set then contains near-copies of training rows and benchmark numbers
    are inflated. Here every document hashes the id of its near-dup
    CLUSTER (min doc_id over the connected component of the corpus-dedup
    edge graph, the same clustering ``dedup_corpus`` keeps one
    representative from), so a whole cluster always shares one split.
    Documents with no near-dup edge cluster to themselves.

    Adds ``root_id`` (the hashed cluster id) and ``split``. Same
    stability contract as :func:`assign_split`: membership is a pure
    function of (cluster, salt), so appending a new dump never moves an
    existing document between splits — unless the new dump links two old
    clusters, in which case the merged cluster coherently follows its
    new min id (the leakage-safety invariant is preserved, not broken,
    by the move)."""
    from esmarc_spark.ops.dedup import (
        near_dup_edges,
        signed_node_col,
        signed_unnode_col,
    )
    from esmarc_spark.pipeline.canonicalize import canonical_mapping

    edges = near_dup_edges(
        documents, threshold, num_hashes, bands, shingle_k, max_bucket_size
    ).select(
        signed_node_col("doc_a").alias("src"),
        signed_node_col("doc_b").alias("dst"),
    )
    mapping = canonical_mapping(edges).select(
        F.col("uri").alias("_u"), F.col("canonical_uri").alias("_c")
    ).select(
        signed_unnode_col("_u").alias("doc_id"),
        signed_unnode_col("_c").alias("root_id"),
    )
    names, cuts = _split_cuts(ratios)
    return (
        documents.join(mapping, "doc_id", "left")
        .withColumn("root_id", F.coalesce(F.col("root_id"), F.col("doc_id")))
        .withColumn("split", _split_case(F.col("root_id"), names, cuts, salt))
    )


def leakage_safe_split_sql(
    ratios: dict[str, float],
    salt: str = "",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> str:
    """DuckDB oracle for :func:`assign_split_leakage_safe` over the
    ``documents`` view: clusters via a RECURSIVE transitive-closure CTE
    (independent of the Spark star-contraction CC), then the shared
    cut-point CASE over the portable hash of the cluster root."""
    from esmarc_spark.ops.dedup import jaccard_pairs_sql

    names, cuts = _split_cuts(ratios)
    whens = " ".join(
        f"WHEN {_bucket_sql('root_id', salt)} < {cut} THEN '{name}'"
        for name, cut in zip(names[:-1], cuts[:-1])
    )
    return f"""
WITH RECURSIVE kept AS (
  SELECT doc_a, doc_b FROM ({jaccard_pairs_sql(num_hashes, bands, shingle_k)})
  WHERE jaccard >= {threshold}
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM kept
  UNION
  SELECT doc_b, doc_a FROM kept
),
reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a WHERE e2.b <> r.a
),
root AS (
  SELECT a AS doc_id, least(a, min(b)) AS root FROM reach GROUP BY a
),
rooted AS (
  SELECT d.doc_id, coalesce(r.root, d.doc_id) AS root_id
  FROM documents d LEFT JOIN root r USING (doc_id)
)
SELECT doc_id, root_id, CASE {whens} ELSE '{names[-1]}' END AS split
FROM rooted
ORDER BY doc_id
"""
