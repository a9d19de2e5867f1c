from esmarc_spark.marc.records import (
    collapse,
    entity_of,
    field_values,
    merge_value,
    occurrence_maps,
)

__all__ = [
    "collapse",
    "entity_of",
    "field_values",
    "merge_value",
    "occurrence_maps",
]
