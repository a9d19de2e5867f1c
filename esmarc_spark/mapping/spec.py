"""Declarative entity-mapping spec: the re-expression of the reference's
``entities`` function-pointer table (/root/reference/esmarc/esmarc.py:39-237)
as *pure data*.

Grammar per cell:
    "literal string"                      -> constant
    {"fn": "<extractor>", "key": <sel>}   -> named extractor over selector(s)
    [cell, cell, ...]                     -> evaluate each, merge results

Every property key is ``"<single|multi>:<property>"`` — the cardinality
contract applied after extraction (single -> scalar, multi -> always list),
mirroring the reference's ``single_or_multi`` post-pass.

The spec is deliberately serializable (JSON-safe): extractors are referenced
by name and resolved through EXTRACTORS at compile time, which is what lets
the Spark driver ship the whole mapping to executors as a broadcast value.
"""

from __future__ import annotations

from esmarc_spark.mapping import extractors as X

SCHEMA_CONTEXT = "https://raw.githubusercontent.com/slub/esmarc/master/conf/context.jsonld"

EXTRACTORS = {
    "id": X.build_id,
    "marc": lambda record, key, entity: X.field_values(record, key, entity),
    "name": X.build_name,
    "same_as": X.build_same_as,
    "mentions": X.build_mentions,
    "classifications": X.build_classifications,
    "publisher": X.build_publisher,
    "original_publisher": X.build_original_publisher,
    "publish_locations": X.build_publish_locations,
    "cartographic": X.build_cartographic_data,
    "geo_coordinates": X.build_geo_coordinates,
    "identifiers": X.build_identifiers,
    "gender": X.build_gender,
    "page_count": X.build_page_count,
    "genre": X.build_genre,
    "access_mode": X.build_access_mode,
    "date_modified": X.build_date_modified,
}

_COMMON = {
    "single:@context": SCHEMA_CONTEXT,
    "single:@id": {"fn": "id", "key": "001"},
    "single:identifier": {"fn": "marc", "key": "001"},
    "single:_ppn": {"fn": "marc", "key": "001"},
    "single:dateModified": {"fn": "date_modified", "key": "005"},
    "multi:sameAs": {"fn": "same_as", "key": ["035..a", "670..u"]},
}

ENTITY_MAPPING: dict[str, dict] = {
    "resources": {
        "single:@type": "http://schema.org/CreativeWork",
        "single:@context": SCHEMA_CONTEXT,
        "single:@id": {"fn": "id", "key": "001"},
        "single:_ppn": {"fn": "marc", "key": "001"},
        "single:_sourceID": {"fn": "marc", "key": "980..b"},
        "single:dateModified": {"fn": "date_modified", "key": "005"},
        "multi:identifier": {"fn": "identifiers", "key": "024"},
        "multi:sameAs": {"fn": "same_as", "key": ["016", "035..a"]},
        "single:preferredName": {"fn": "name", "key": ["245..a", "245..b"]},
        "multi:genre": {"fn": "genre", "key": "655..a"},
        "single:license": {"fn": "marc", "key": "540..a"},
        "single:numberOfPages": {
            "fn": "page_count",
            "key": ["300..a", "300..b", "300..c", "300..d", "300..e", "300..f", "300..g"],
        },
        "single:pageStart": {"fn": "marc", "key": "773..q"},
        "single:issueNumber": {"fn": "marc", "key": "773..l"},
        "single:volumeNumer": {"fn": "marc", "key": "773..v"},
        "multi:description": {"fn": "marc", "key": ["520..a"]},
        "multi:mentions": {
            "fn": "mentions",
            "key": ["600", "610", "611", "630", "648", "650", "651", "653", "655", "689"],
        },
        "single:cartographicData": {"fn": "cartographic", "key": "255"},
        "multi:classifications": {
            "fn": "classifications",
            "key": ["050._0", "082.0_", "082.04", "084.__"],
        },
        "single:accessMode": {"fn": "access_mode", "key": "007"},
        "multi:publisher": {"fn": "publisher", "key": ["533", "264"]},
        "multi:originalPublisher": {"fn": "original_publisher", "key": ["533", "264"]},
        "multi:location": {"fn": "publish_locations", "key": "751"},
    },
    "works": {
        "single:@type": "http://schema.org/CreativeWork",
        **_COMMON,
        "single:preferredName": {
            "fn": "name",
            "key": ["100..t", "110..t", "130..t", "111..t", "130..a"],
        },
        "single:alternativeHeadline": {"fn": "marc", "key": ["245..c"]},
        "multi:alternateName": {
            "fn": "marc",
            "key": ["400..t", "410..t", "411..t", "430..t", "240..a", "240..p",
                     "246..a", "246..b", "245..p", "249..a", "249..b", "730..a",
                     "730..p", "740..a", "740..p", "920..t"],
        },
        "single:genre": {"fn": "marc", "key": "655..a"},
        "single:license": {"fn": "marc", "key": "540..a"},
    },
    "persons": {
        "single:@type": "http://schema.org/Person",
        **_COMMON,
        "single:preferredName": {"fn": "name", "key": "100..a"},
        "single:gender": {"fn": "gender", "key": "375..a"},
        "multi:alternateName": {"fn": "marc", "key": ["400..a", "400..c"]},
    },
    "organizations": {
        "single:@type": "http://schema.org/Organization",
        **_COMMON,
        "single:preferredName": {"fn": "name", "key": "110..a+b"},
        "multi:alternateName": {"fn": "marc", "key": "410..a+b"},
    },
    "geo": {
        "single:@type": "http://schema.org/Place",
        **_COMMON,
        "single:preferredName": {"fn": "name", "key": "151..a"},
        "multi:alternateName": {"fn": "marc", "key": "451..a"},
        "single:geo": {
            "fn": "geo_coordinates",
            "key": {"longitude": ["034..d", "034..e"], "latitude": ["034..f", "034..g"]},
        },
        "single:adressRegion": {"fn": "marc", "key": "043..c"},
    },
    "topics": {
        "single:@type": "http://schema.org/Thing",
        **_COMMON,
        "single:preferredName": {"fn": "marc", "key": "150..a"},
        "multi:alternateName": {"fn": "marc", "key": "450..a+x"},
        "single:description": {"fn": "marc", "key": "679..a"},
    },
    "events": {
        "single:@type": "http://schema.org/Event",
        **_COMMON,
        "single:preferredName": {"fn": "name", "key": ["111..a"]},
        "multi:alternateName": {"fn": "marc", "key": ["411..a"]},
        "single:adressRegion": {"fn": "marc", "key": "043..c"},
    },
}
