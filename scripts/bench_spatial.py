"""Spatial enrichment at gazetteer scale (round 6 — VERDICT r5 #8): the
grid-cell GeoNames join has only ever run at fixture scale; this drives it
at 10^6 gazetteer points with a SKEWED, city-heavy distribution and
records the cell-size distribution plus wall time.

Skew model (deterministic, hash-derived):
  * 50% of gazetteer points cluster around 20 "city" centers inside a
    ~0.05 deg box (a few km) — and 5% of each city's points sit at the
    EXACT center (real gazetteers pin unknown coordinates to the city
    default), which manufactures genuinely hot cells;
  * the rest is uniform over a continent-sized box (lat 35..60,
    lon -10..30).
The probe side is city-heavy with the same mixture — entities concentrate
exactly where the gazetteer does, the worst case for the join.

Writes BENCH/spatial.json.
Usage: python scripts/bench_spatial.py [n_gaz] [n_entities]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_CITIES = 20
RADIUS_KM = 1.0


def main() -> None:
    n_gaz = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_ent = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark.sql import functions as F

    from esmarc_spark.pipeline.enrichment import spatial_enrich
    from esmarc_spark.session import get_spark

    spark = get_spark("bench-spatial", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    spark.range(200_000_000).select(
        F.sum(F.xxhash64("id").cast("decimal(38,0)"))
    ).collect()
    calibration = round(time.time() - t0, 2)

    def u(col, salt: int, lo: float, hi: float):
        """Deterministic uniform double in [lo, hi) from a hash."""
        h = F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1 << 30)).cast("double")
        return F.lit(lo) + h / F.lit(float(1 << 30)) * F.lit(hi - lo)

    def synth(n: int, name_prefix: str, salt: int):
        df = spark.range(0, n, 1, 32)
        i = F.col("id")
        city = F.pmod(F.xxhash64(i, F.lit(salt)), F.lit(N_CITIES))
        city_lat = F.lit(35.0) + city.cast("double") * F.lit(25.0 / N_CITIES)
        city_lon = F.lit(-10.0) + city.cast("double") * F.lit(40.0 / N_CITIES)
        is_city = F.pmod(F.xxhash64(i, F.lit(salt + 1)), F.lit(100)) < 50
        pinned = F.pmod(F.xxhash64(i, F.lit(salt + 2)), F.lit(100)) < 5
        lat = (
            F.when(is_city & pinned, city_lat)
            .when(is_city, city_lat + u(i, salt + 3, -0.025, 0.025))
            .otherwise(u(i, salt + 4, 35.0, 60.0))
        )
        lon = (
            F.when(is_city & pinned, city_lon)
            .when(is_city, city_lon + u(i, salt + 5, -0.025, 0.025))
            .otherwise(u(i, salt + 6, -10.0, 30.0))
        )
        return df.select(
            F.concat(F.lit(name_prefix), i.cast("string")).alias("name"),
            F.round(lat, 6).alias("lat"),
            F.round(lon, 6).alias("lon"),
        )

    p_gaz = "/tmp/bench_spatial_gaz.parquet"
    p_ent = "/tmp/bench_spatial_ent.parquet"
    # gazetteer names CONTAIN the place token so the name predicate has
    # real selectivity; entity n matches gazetteer place n%something only
    # incidentally — we bench with name_match=False (pure spatial) AND
    # name_match=True over a shared-name rendering
    synth(n_gaz, "place", 7).select(
        F.col("name").alias("geo_name"),
        F.col("lat").alias("geo_lat"),
        F.col("lon").alias("geo_lon"),
        F.concat(F.lit("g"), F.monotonically_increasing_id().cast("string")).alias("geo_id"),
    ).write.mode("overwrite").parquet(p_gaz)
    synth(n_ent, "place", 11).write.mode("overwrite").parquet(p_ent)

    gaz = spark.read.parquet(p_gaz)
    ents = spark.read.parquet(p_ent)

    # cell-size distribution on the gazetteer side (the build side of the
    # equi-join): the skew evidence
    cell_deg = RADIUS_KM / 111.0
    sizes = (
        gaz.groupBy(
            F.floor(F.col("geo_lat") / cell_deg).alias("cy"),
            F.floor(F.col("geo_lon") / cell_deg).alias("cx"),
        )
        .count()
        .agg(
            F.count("*").alias("n_cells"),
            F.expr("percentile_approx(count, 0.5)").alias("p50"),
            F.expr("percentile_approx(count, 0.99)").alias("p99"),
            F.max("count").alias("max"),
            F.sum(F.when(F.col("count") > 1000, F.col("count")).otherwise(0)).alias(
                "rows_in_hot_cells"
            ),
        )
        .collect()[0]
    )

    out = {
        "n_gaz": n_gaz,
        "n_entities": n_ent,
        "radius_km": RADIUS_KM,
        "calibration_sec": calibration,
        "cell_stats": {
            "n_cells": sizes["n_cells"],
            "p50": sizes["p50"],
            "p99": sizes["p99"],
            "max": sizes["max"],
            "rows_in_hot_cells": int(sizes["rows_in_hot_cells"]),
        },
        "runs": [],
    }
    for label, name_match in (("spatial_only", False), ("name_match", True)):
        # fresh lineage per timed run (stage-reuse gotcha)
        g = spark.read.parquet(p_gaz)
        e = spark.read.parquet(p_ent)
        t0 = time.time()
        n = spatial_enrich(e, g, radius_km=RADIUS_KM, name_match=name_match).count()
        wall = round(time.time() - t0, 2)
        out["runs"].append({"label": label, "matches": n, "wall_sec": wall})
        print(json.dumps(out["runs"][-1]), flush=True)

    (REPO / "BENCH" / "spatial.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out["cell_stats"]))
    spark.stop()


if __name__ == "__main__":
    main()
