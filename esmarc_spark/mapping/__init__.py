from esmarc_spark.mapping.extractors import (
    build_cartographic_data,
    build_classifications,
    build_mentions,
    build_original_publisher,
    build_publish_locations,
    build_publisher,
    build_same_as,
)
from esmarc_spark.mapping.spec import ENTITY_MAPPING
from esmarc_spark.mapping.engine import map_record, record_to_triples

__all__ = [
    "ENTITY_MAPPING",
    "build_cartographic_data",
    "build_classifications",
    "build_mentions",
    "build_original_publisher",
    "build_publish_locations",
    "build_publisher",
    "build_same_as",
    "map_record",
    "record_to_triples",
]
