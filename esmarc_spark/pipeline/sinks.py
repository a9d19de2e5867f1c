"""Output sinks matching the reference's delivery contracts.

* ``write_entity_ldj``  — the reference's actual output: one directory per
  entity type holding gzipped JSON-lines files (ref esmarc.py:296-322,
  ``prefix+entity/<worker>-records.ldj.gz``). Spark rendering:
  ``partitionBy("entity")`` text sink with gzip codec — one
  ``entity=<type>/part-*.txt.gz`` directory per entity, each line one
  JSON-LD document. Partitioned writes scale (no driver funnel, one file
  per task per entity) and readers prune by entity directory.

* ``ENTITY_STRUCTS`` / ``read_entity_ldj`` — typed StructType per entity.
  The reference ships per-entity Elasticsearch mappings
  (/root/reference/mapping/*.json) that explicitly type ONLY the date
  nodes (everything else is ES dynamic mapping); the date-node property
  names and their value keys are vendored in ``ENTITY_DATE_NODES`` below.
  The StructTypes type those nodes plus the stable JSON-LD core the engine
  always emits; ES ``date``-typed keys carry ``{"es_type": "date"}`` field
  metadata (kept as strings: the reference writes partial dates like
  "1987" that Spark's DateType would reject or mangle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# date-node properties per entity and the key the ES mapping types as date
# — vendored from /root/reference/mapping/{entity}.json
ENTITY_DATE_NODES: dict[str, dict[str, str]] = {
    "events": {"startDate": "@value", "endDate": "@value"},
    "geo": {"dateOfEstablishment": "@value", "dateOfTermination": "@value"},
    "organizations": {"dateOfEstablishment": "@value", "dateOfTermination": "@value"},
    "topics": {"dateOfEstablishment": "@value", "dateOfTermination": "@value"},
    "works": {"dateOfEstablishment": "@value", "dateOfTermination": "@value"},
    "persons": {
        "periodOfActivityStart": "@value",
        "periodOfActivityEnd": "@value",
        "birthDate": "@value",
        "deathDate": "@value",
    },
    "resources": {"datePublished": "dateParsed"},
}


def _date_node(value_key: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(value_key, T.StringType(), metadata={"es_type": "date"}),
            T.StructField("description", T.StringType()),
            T.StructField("disambiguatingDescription", T.StringType()),
        ]
    )


def _publisher_node() -> T.StructType:
    return T.StructType(
        [
            T.StructField("@id", T.StringType()),
            T.StructField("abbr", T.StringType()),
            T.StructField("preferredName", T.StringType()),
        ]
    )


def _same_as_node() -> T.StructType:
    return T.StructType(
        [
            T.StructField("@id", T.StringType()),
            T.StructField("publisher", _publisher_node()),
            T.StructField(
                "isBasedOn",
                T.StructType(
                    [
                        T.StructField("@type", T.StringType()),
                        T.StructField("@id", T.StringType()),
                    ]
                ),
            ),
        ]
    )


def entity_struct(entity: str) -> T.StructType:
    """Typed read schema for one entity's LDJ output: the JSON-LD core the
    engine always emits + the reference-typed date nodes."""
    fields = [
        T.StructField("@id", T.StringType()),
        T.StructField("@type", T.StringType()),
        T.StructField("@context", T.StringType()),
        T.StructField("identifier", T.StringType()),
        T.StructField("_isil", T.StringType()),
        T.StructField("_ppn", T.StringType()),
        T.StructField("dateModified", T.StringType()),
        T.StructField("preferredName", T.StringType()),
        T.StructField("isBasedOn", T.StringType()),
        T.StructField("sameAs", T.ArrayType(_same_as_node())),
    ]
    for prop, value_key in sorted(ENTITY_DATE_NODES.get(entity, {}).items()):
        fields.append(T.StructField(prop, _date_node(value_key)))
    return T.StructType(fields)


ENTITY_STRUCTS: dict[str, T.StructType] = {
    e: entity_struct(e) for e in ENTITY_DATE_NODES
}


def write_entity_ldj(
    docs: DataFrame, out_dir: str, compress: bool = True, mode: str = "overwrite"
) -> None:
    """(entity, doc) -> ``out_dir/entity=<type>/part-*.txt[.gz]`` with one
    JSON document per line — the reference's per-entity LDJ(.gz) contract
    as a distributed partitioned write."""
    writer = (
        docs.select("entity", F.col("doc").alias("value"))
        .write.mode(mode)
        .partitionBy("entity")
    )
    if compress:
        writer = writer.option("compression", "gzip")
    writer.text(out_dir)


def read_entity_ldj(
    spark: SparkSession, out_dir: str, entity: str, typed: bool = True
) -> DataFrame:
    """Read one entity's LDJ directory back; ``typed=True`` applies the
    entity StructType (unknown properties are dropped — the ES-dynamic
    remainder stays available via ``typed=False`` raw JSON lines)."""
    lines = spark.read.text(f"{out_dir}/entity={entity}")
    if not typed:
        return lines.select(F.col("value").alias("doc"))
    schema = ENTITY_STRUCTS.get(entity, entity_struct(entity))
    return lines.select(
        F.from_json(F.col("value"), schema).alias("d")
    ).select("d.*")
