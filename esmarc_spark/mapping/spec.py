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

from esmarc_spark.mapping import dates as D
from esmarc_spark.mapping import extractors as X
from esmarc_spark.mapping import nodes as N

SCHEMA_CONTEXT = "https://raw.githubusercontent.com/slub/esmarc/master/conf/context.jsonld"

EXTRACTORS = {
    "id": X.build_id,
    "isil": X.build_isil,
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
    # wave 2
    "start_date": D.build_start_date,
    "end_date": D.build_end_date,
    "date_published": D.build_date_published,
    "date_original_published": D.build_date_original_published,
    "date_created": D.build_date_created,
    "contributors": N.build_contributors,
    "topic_name": N.build_topic_name,
    "title": N.build_title,
    "subfield_node": N.build_subfield_node,
    "subfield_if_4": N.build_subfield_if_4,
    "language": N.build_language,
    "footnotes": N.build_footnotes,
    "collection": N.build_collection,
    "usage_info": N.build_usage_info,
    "physical": N.build_physical,
    "offers": N.build_offers,
    "edition_statement": N.build_edition_statement,
    "edition_sequence": N.build_edition_sequence,
    "repro_series": N.build_repro_series,
    "related": N.build_related,
    "identified_by": N.build_identified_by,
    "about": N.build_about,
    "series_statement": N.build_series_statement,
    "part_of_series": N.build_part_of_series,
    "is_part_of": N.build_is_part_of,
    "relations": N.build_relations,
}

_COMMON = {
    "single:@context": SCHEMA_CONTEXT,
    "single:@id": {"fn": "id", "key": "001"},
    "single:identifier": {"fn": "marc", "key": "001"},
    "single:_isil": {"fn": "isil", "key": "003"},
    "single:_ppn": {"fn": "marc", "key": "001"},
    "single:dateModified": {"fn": "date_modified", "key": "005"},
    "multi:sameAs": {"fn": "same_as", "key": ["035..a", "670..u"]},
    "multi:about": {"fn": "about", "key": ["936", "084", "083", "082", "655"]},
}

ENTITY_MAPPING: dict[str, dict] = {
    "resources": {
        "single:@type": "http://schema.org/CreativeWork",
        "single:@context": SCHEMA_CONTEXT,
        "single:@id": {"fn": "id", "key": "001"},
        "single:_isil": {"fn": "isil", "key": ["003", "852..a", "924..b"]},
        "single:_ppn": {"fn": "marc", "key": "001"},
        "single:_sourceID": {"fn": "marc", "key": "980..b"},
        "single:dateModified": {"fn": "date_modified", "key": "005"},
        "multi:identifier": {"fn": "identifiers", "key": "024"},
        "multi:sameAs": {"fn": "same_as", "key": ["016", "035..a"]},
        "single:offers": {"fn": "offers", "key": ["924..b", "001"]},
        "single:title": {
            "fn": "title",
            "key": ["130", "210", "240", "245", "246", "247", "249", "501",
                     "505", "700", "710", "711", "730"],
        },
        "single:preferredName": {"fn": "name", "key": ["245..a", "245..b"]},
        "multi:contributor": {
            "fn": "contributors",
            "key": ["100", "110", "111", "700", "710", "711"],
        },
        "single:Thesis": {"fn": "marc", "key": ["502..a", "502..b", "502..c", "502..d"]},
        "multi:locationCreated": {"fn": "subfield_if_4", "key": "551^4:orth"},
        "multi:relatedTo": {"fn": "related", "key": "500..0"},
        "multi:relatedEvent": {"fn": "subfield_node", "key": "711"},
        "single:physical_description": {"fn": "physical", "key": ["300", "533"]},
        "multi:collection": {"fn": "collection", "key": ["084..a", "935..a"]},
        "single:editionStatement": {"fn": "edition_statement", "key": "250"},
        "single:reproductionType": {"fn": "marc", "key": "533..a"},
        "single:editionSequence": {"fn": "edition_sequence", "key": "362"},
        "multi:additionalInfo": {
            "fn": "footnotes",
            "key": ["242", "385", "500", "502", "508", "511", "515", "518",
                     "521", "533", "535", "538", "546", "555", "561", "563", "937"],
        },
        "multi:language": {"fn": "language", "key": "041..a"},
        "multi:originalLanguage": {"fn": "language", "key": "041..h"},
        "multi:identifiedBy": {
            "fn": "identified_by",
            "key": ["015", "020", "022", "024", "026", "028", "030", "035",
                     "088", "510", "770", "772", "773", "775", "776", "780",
                     "785", "787", "800", "810", "811", "830"],
        },
        "multi:seriesStatement": {"fn": "series_statement", "key": "490"},
        "multi:partOfSeries": {
            "fn": "part_of_series",
            "key": ["776", "800", "810", "811", "830"],
        },
        "multi:isPartOf": {"fn": "is_part_of", "key": ["245", "773"]},
        "multi:relations": {
            "fn": "relations",
            "key": ["770", "772", "775", "776", "780", "785", "787"],
        },
        "multi:reproductionSeriesStatement": {"fn": "repro_series", "key": "533..f"},
        "multi:usageInfo": {"fn": "usage_info", "key": ["506.*", "540.__"]},
        "single:datePublished": {"fn": "date_published", "key": ["008", "533", "534", "264"]},
        "multi:genre": {"fn": "genre", "key": "655..a"},
        "single:license": {"fn": "marc", "key": "540..a"},
        "single:numberOfPages": {
            "fn": "page_count",
            "key": ["300..a", "300..b", "300..c", "300..d", "300..e", "300..f", "300..g"],
        },
        "single:pageStart": {"fn": "marc", "key": "773..q"},
        "single:issueNumber": {"fn": "marc", "key": "773..l"},
        "single:volumeNumer": {"fn": "marc", "key": "773..v"},
        "multi:about": {"fn": "about", "key": ["936", "084", "083", "082", "655"]},
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
        "single:dateCreated": {"fn": "date_created", "key": ["008"]},
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
        "multi:author": {"fn": "subfield_node", "key": "500"},
        "multi:contributor": {"fn": "subfield_node", "key": "700"},
        "single:datePublished": {"fn": "marc", "key": ["130..f", "260..c", "264..c", "362..a"]},
        # ref esmarc.py works block: Thesis/issn/isbn/hasPart/isPartOf and the
        # 773-linkage scalars are plain getmarc cells (not the resources-style
        # node builders); numberOfPages uses getnumberofpages
        "single:Thesis": {"fn": "marc", "key": ["502..a", "502..b", "502..c", "502..d"]},
        "multi:issn": {
            "fn": "marc",
            "key": ["022..a", "022..y", "022..z", "029..a", "490..x", "730..x",
                     "773..x", "776..x", "780..x", "785..x", "800..x", "810..x",
                     "811..x", "830..x"],
        },
        "multi:isbn": {
            "fn": "marc",
            "key": ["020..a", "022..a", "022..z", "776..z", "780..z", "785..z"],
        },
        "single:hasPart": {"fn": "marc", "key": "773..g"},
        "single:isPartOf": {"fn": "marc", "key": ["773..t", "773..s", "773..a"]},
        "single:numberOfPages": {
            "fn": "page_count",
            "key": ["300..a", "300..b", "300..c", "300..d", "300..e", "300..f", "300..g"],
        },
        "single:pageStart": {"fn": "marc", "key": "773..q"},
        "single:issueNumber": {"fn": "marc", "key": "773..l"},
        "single:volumeNumer": {"fn": "marc", "key": "773..v"},
        "single:genre": {"fn": "marc", "key": "655..a"},
        "single:license": {"fn": "marc", "key": "540..a"},
        "multi:inLanguage": {"fn": "marc", "key": ["377..a", "041..a", "041..d", "130..l", "730..l"]},
        "single:locationCreated": {"fn": "subfield_if_4", "key": "551^orth"},
        "multi:relatedTo": {"fn": "related", "key": "500"},
        "single:dateOfEstablishment": {"fn": "start_date", "key": "548^datb,dats"},
        "single:dateOfTermination": {"fn": "end_date", "key": "548^datb,dats"},
    },
    "persons": {
        "single:@type": "http://schema.org/Person",
        **_COMMON,
        "single:dateCreated": {"fn": "date_created", "key": ["008"]},
        "single:preferredName": {"fn": "name", "key": "100..a"},
        "single:gender": {"fn": "gender", "key": "375..a"},
        "multi:alternateName": {"fn": "marc", "key": ["400..a", "400..c"]},
        "multi:relatedTo": {"fn": "related", "key": "500..0"},
        "multi:hasOccupation": {"fn": "subfield_node", "key": "550"},
        "single:birthPlace": {"fn": "subfield_if_4", "key": "551^ortg"},
        "single:deathPlace": {"fn": "subfield_if_4", "key": "551^orts"},
        "single:workLocation": {"fn": "subfield_if_4", "key": "551^ortw"},
        "multi:honorificPrefix": [
            {"fn": "subfield_if_4", "key": "550^adel"},
            {"fn": "subfield_if_4", "key": "550^akad"},
        ],
        "single:periodOfActivityStart": {"fn": "start_date", "key": "548^datw,datz"},
        "single:periodOfActivityEnd": {"fn": "end_date", "key": "548^datw,datz"},
        "single:birthDate": {"fn": "start_date", "key": "548^datl,datx"},
        "single:deathDate": {"fn": "end_date", "key": "548^datl,datx"},
    },
    "organizations": {
        "single:@type": "http://schema.org/Organization",
        **_COMMON,
        "single:dateCreated": {"fn": "date_created", "key": ["008"]},
        "single:preferredName": {"fn": "name", "key": "110..a+b"},
        "multi:alternateName": {"fn": "marc", "key": "410..a+b"},
        "single:additionalType": {"fn": "subfield_if_4", "key": "550^obin"},
        "single:parentOrganization": {"fn": "subfield_if_4", "key": "551^adue"},
        "single:location": {"fn": "subfield_if_4", "key": "551^orta"},
        "single:fromLocation": {"fn": "subfield_if_4", "key": "551^geoa"},
        "single:areaServed": {"fn": "subfield_if_4", "key": "551^geow"},
        "single:dateOfEstablishment": {"fn": "start_date", "key": "548^datb"},
        "single:dateOfTermination": {"fn": "end_date", "key": "548^datb"},
    },
    "geo": {
        "single:@type": "http://schema.org/Place",
        **_COMMON,
        "single:dateCreated": {"fn": "date_created", "key": ["008"]},
        "single:preferredName": {"fn": "name", "key": "151..a"},
        "multi:alternateName": {"fn": "marc", "key": "451..a"},
        "single:description": {"fn": "subfield_node", "key": "551"},
        "single:geo": {
            "fn": "geo_coordinates",
            "key": {"longitude": ["034..d", "034..e"], "latitude": ["034..f", "034..g"]},
        },
        "single:adressRegion": {"fn": "marc", "key": "043..c"},
        "single:dateOfEstablishment": {"fn": "start_date", "key": "548^datb,dats"},
        "single:dateOfTermination": {"fn": "end_date", "key": "548^datb,dats"},
    },
    "topics": {
        "single:@type": "http://schema.org/Thing",
        **_COMMON,
        "single:dateCreated": {"fn": "date_created", "key": ["008"]},
        "single:preferredName": {"fn": "topic_name", "key": "150"},
        "multi:alternateName": {"fn": "marc", "key": "450..a+x"},
        "single:description": {"fn": "marc", "key": "679..a"},
        "multi:additionalType": {"fn": "subfield_node", "key": "550"},
        "multi:location": {"fn": "subfield_if_4", "key": "551^orta"},
        "multi:fromLocation": {"fn": "subfield_if_4", "key": "551^geoa"},
        "multi:areaServed": {"fn": "subfield_if_4", "key": "551^geow"},
        "multi:contentLocation": {"fn": "subfield_if_4", "key": "551^punk"},
        "multi:participant": {"fn": "subfield_if_4", "key": "551^bete"},
        "multi:relatedTo": {"fn": "subfield_if_4", "key": "551^vbal"},
        "single:dateOfEstablishment": {"fn": "start_date", "key": "548^datb"},
        "single:dateOfTermination": {"fn": "end_date", "key": "548^datb"},
    },
    "events": {
        "single:@type": "http://schema.org/Event",
        **_COMMON,
        "single:dateCreated": {"fn": "date_created", "key": ["008"]},
        "single:preferredName": {"fn": "name", "key": ["111..a"]},
        "multi:alternateName": {"fn": "marc", "key": ["411..a"]},
        "single:location": {"fn": "subfield_if_4", "key": "551^ortv"},
        "single:startDate": {"fn": "start_date", "key": "548^datv"},
        "single:endDate": {"fn": "end_date", "key": "548^datv"},
        "single:adressRegion": {"fn": "marc", "key": "043..c"},
    },
}

# works is the ONLY reference entity without a multi:about cell
# (ref esmarc.py:92-120 vs every other entity block) — _COMMON adds it,
# so strip it here
del ENTITY_MAPPING["works"]["multi:about"]
