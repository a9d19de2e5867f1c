"""CLI mirroring the reference's entry points (SURVEY.md §3.1/§3.2) on
Spark sources/sinks:

    python -m esmarc_spark -in records.jsonl -prefix out/ -z -w 8
    python -m esmarc_spark -in records.parquet -idfile ids.txt -prefix out/
    python -m esmarc_spark -in records.jsonl -id 1234 -debug

Reference flag -> here:
  -server/-index (ES scroll)  -> -in  (parquet dir or MARC-JSON .ldj/.jsonl)
  -w N  (multiprocessing Pool)-> local[N] Spark session (cluster: spark-submit)
  -prefix, -z                 -> per-entity LDJ(.gz) sink (pipeline.sinks)
  -idfile                     -> broadcast semi-join on 001 (ops.relational
                                 ID-file semantics)
  -id + -debug                -> single-record synchronous path: docs printed
                                 to stdout as JSON lines (ref esmarc.py:258-265)

The reference's -base_id_src/-target_id are compile-time constants here
(lookups.dims); passing different values is rejected rather than silently
ignored.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load_records(spark: SparkSession, path: str) -> DataFrame:
    """(record_id, marc_json) from a parquet dir or a raw MARC-JSON lines
    file. record_id = the 001 control number."""
    if path.endswith((".ldj", ".jsonl", ".json", ".txt", ".gz")):
        raw = spark.read.text(path).select(F.col("value").alias("marc_json"))
    else:
        df = spark.read.parquet(path)
        if "marc_json" not in df.columns:
            raise SystemExit(
                f"parquet input must carry a marc_json column, got {df.columns}"
            )
        raw = df.select("marc_json")
    return raw.select(
        F.get_json_object("marc_json", "$.001").alias("record_id"), "marc_json"
    )


def _filter_idfile(records: DataFrame, idfile: str) -> DataFrame:
    spark = records.sparkSession
    ids = spark.read.text(idfile).select(
        F.trim(F.col("value")).alias("record_id")
    ).where(F.col("record_id") != "")
    return records.join(F.broadcast(ids), "record_id", "left_semi")


def main(argv: list[str] | None = None) -> int:
    from esmarc_spark.lookups import dims

    p = argparse.ArgumentParser(prog="esmarc_spark", description=__doc__)
    p.add_argument("-in", dest="input", required=True,
                   help="parquet dir (marc_json column) or MARC-JSON lines file")
    p.add_argument("-prefix", type=str, default="ldj/",
                   help="output directory (one subdir per entity)")
    p.add_argument("-z", action="store_true", help="gzip the output LDJ")
    p.add_argument("-w", type=int, default=8, help="local worker cores")
    p.add_argument("-idfile", type=str, help="file of 001 ids to keep")
    p.add_argument("-id", dest="single_id", type=str,
                   help="single record id (with -debug prints to stdout)")
    p.add_argument("-debug", action="store_true",
                   help="synchronous single-record path, docs to stdout")
    p.add_argument("-base_id_src", type=str, default=dims.BASE_ID)
    p.add_argument("-target_id", type=str, default=dims.TARGET_ID)
    args = p.parse_args(argv)

    if args.base_id_src != dims.BASE_ID or args.target_id != dims.TARGET_ID:
        raise SystemExit(
            "base_id/target_id are compile-time constants in this engine "
            f"(lookups/dims.py): {dims.BASE_ID} / {dims.TARGET_ID}"
        )

    from esmarc_spark.mapping.engine import DOCS_SCHEMA, mapped_docs_batches
    from esmarc_spark.pipeline.sinks import write_entity_ldj
    from esmarc_spark.session import get_spark

    spark = get_spark("esmarc-cli", cpus=args.w)
    records = _load_records(spark, args.input)
    if args.idfile:
        records = _filter_idfile(records, args.idfile)
    if args.single_id:
        records = records.where(F.col("record_id") == args.single_id)

    docs = records.mapInPandas(mapped_docs_batches, schema=DOCS_SCHEMA)

    if args.debug or args.single_id:
        # entry point B: synchronous, docs to stdout (ref esmarc.py:258-265)
        for r in docs.collect():
            print(r.doc)
        return 0

    write_entity_ldj(docs, args.prefix, compress=args.z)
    counts = {
        r["entity"]: r["n"]
        for r in docs.groupBy("entity").agg(F.count("*").alias("n")).collect()
    }
    print(json.dumps({"written": args.prefix, "per_entity": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
