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
