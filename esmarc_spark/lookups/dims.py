"""Dimension tables (pure data) used by extractors and broadcast joins.

Every table is lifted as *data* from the reference's lookup tables so that
emitted triples/fixtures match:
  * entity dispatch / schema types:  /root/reference/esmarc/lookup_tables/entities.py:1-29
  * mention field templates:        /root/reference/esmarc/lookup_tables/entities.py:31-47
  * authority prefix -> URI + publisher: /root/reference/esmarc/lookup_tables/sameAs.py:1-47
  * classification code sets:       /root/reference/esmarc/lookup_tables/classifications.py:1-55
  * publish-place types:            /root/reference/esmarc/lookup_tables/publisher.py:1-5
  * identifier schemes:             /root/reference/esmarc/lookup_tables/identifiers.py:1-5

In the Spark pipeline these become broadcast dimension DataFrames
(see esmarc_spark.pipeline.link); row-level extractors index them directly.
"""

TARGET_ID = "https://data.slub-dresden.de/"
BASE_ID = "(DE-627)"

ENTITY_TYPES = [
    "persons",
    "topics",
    "organizations",
    "geo",
    "works",
    "events",
    "resources",
]

# 079..b code -> output collection name
ENTITY_DISPATCH = {
    "p": "persons",
    "n": "persons",
    "s": "topics",
    "b": "organizations",
    "g": "geo",
    "u": "works",
    "f": "events",
}

# 079..b code -> schema.org @type
SCHEMA_TYPES = {
    "p": "Person",
    "n": "Person",
    "s": "Thing",
    "b": "Organization",
    "g": "Place",
    "u": "CreativeWork",
    "f": "Event",
}

# 689 $D code -> mention @type
MENTION_TYPE_CODES = {
    "p": "Person",
    "n": "Person",
    "s": "Subject",
    "b": "Organization",
    "g": "GeograficSubject",
    "u": "Works",
    "f": "Event",
}

# 6xx tag -> mention node template: @type constant + @id collection namespace
MENTION_FIELD_TYPES = {
    "600": {"@type": "Persons", "@id": "persons"},
    "610": {"@type": "Organisation", "@id": "organizations"},
    "611": {"@type": "Event", "@id": "events"},
    "630": {"@type": "Works", "@id": "works"},
    "648": {"@type": "ChronologicalSubject"},
    "650": {"@type": "Subject", "@id": "topics"},
    "651": {"@type": "GeograficSubject", "@id": "geo"},
    "653": {"@type": "Subject"},
    "655": {"@type": "Genre", "@id": "topics"},
}

# authority id prefix -> resolved URI base + publisher node
AUTHORITY_PREFIXES = {
    "(DE-588)": {
        "@id": "https://d-nb.info/gnd/",
        "publisher": {
            "preferredName": "Deutsche Nationalbibliothek, Gemeinsame Normdatei",
            "@id": "https://ld.zdb-services.de/resource/organisations/DE-588",
            "abbr": "DNB",
        },
    },
    "(DE-101)": {
        "@id": "https://d-nb.info/",
        "publisher": {
            "preferredName": "Deutsche Nationalbibliothek",
            "@id": "https://ld.zdb-services.de/resource/organisations/DE-101",
            "abbr": "DNB",
        },
    },
    "(DE-627)": {
        "@id": "https://opac.k10plus.de/DB=2.299/PPNSET?PPN=",
        "publisher": {
            "preferredName": "K10Plus",
            "@id": "https://ld.zdb-services.de/resource/organisations/DE-627",
            "abbr": "KXP",
        },
    },
    "(DE-576)": {
        "@id": "https://swb.bsz-bw.de/DB=2.1/PPNSET?PPN=",
        "publisher": {
            "@id": "https://ld.zdb-services.de/resource/organisations/DE-576",
            "preferredName": "Bibliotheksservice-Zentrum Baden-Württemberg (BSZ)",
            "abbr": "BSZ",
        },
    },
    "(DE-600)": {
        "@id": "https://ld.zdb-services.de/resource/",
        "publisher": {
            "@id": "https://ld.zdb-services.de/resource/organisations/DE-600",
            "preferredName": "Zeitschriftendatenbank (ZDB)",
            "abbr": "ZDB",
        },
    },
    "(DE-601)": {"@id": "http://gso.gbv.de/PPN?PPN="},
    "(DE-633)": {
        "@id": "https://opac.rism.info/id/rismid/",
        "publisher": {
            "@id": "https://ld.zdb-services.de/resource/organisations/DE-633",
            "preferredName": "Répertoire International des Sources Musicales",
            "abbr": "RISM",
        },
    },
}

# 751 $4 relator -> place-type label
PLACE_TYPES = {
    "dbp": "Distribution place",
    "mfp": "Manufacture place",
    "prp": "Production place",
    "pup": "Publication place",
    "uvp": "University place",
}

# 024 $2 scheme -> resolver URL
IDENTIFIER_SCHEMES = {
    "doi": "https://doi.org/",
    "hdl": "https://hdl.handle.net/",
    "urn": "https://nbn-resolving.org/",
}

# classification scheme key (field.indicator or $2 code) -> CategoryCodeSet
# stencil; "codeValue"/"@id" of the inner CategoryCode get filled per value.
CLASSIFICATION_SCHEMES = {
    "ssgn": {
        "@type": "CategoryCodeSet",
        "name": "Sondersammelgebiets-Nummer",
        "alternateName": ["SSG", "SSGN"],
        "sameAs": "https://www.wikidata.org/wiki/Q71786666",
        "CategoryCodes": [{"@type": "CategoryCode", "codeValue": None}],
    },
    "sdnb": {
        "@type": "CategoryCodeSet",
        "name": "Sachgruppen der DNB bis 2003",
        "alternateName": [
            "SDNB bis 2003",
            "Systematik der Deutschen Nationalbibliografie bis 2003",
            "DNB-Sachgruppen bis 2003",
            "Sachgruppen der Deutschen Nationalbibliografie bis 2003",
        ],
        "sameAs": "https://www.wikidata.org/wiki/Q113660734",
        "CategoryCodes": [{"@type": "CategoryCode", "codeValue": None}],
    },
    "fid": {
        "@type": "CategoryCodeSet",
        "name": "Kennzeichen der DFG geförderten Fachinformationsdienste für die Wissenschaft",
        "alternateName": ["FID", "FID Kennzeichen"],
        "sameAs": "http://wikis.sub.uni-hamburg.de/webis/index.php/Webis_-_Sammelschwerpunkte_an_deutschen_Bibliotheken",
        "CategoryCodes": [{"@type": "CategoryCode", "codeValue": None}],
    },
    "bkl": {
        "@type": "CategoryCodeSet",
        "@id": "http://uri.gbv.de/terminology/bk/",
        "name": "Basisklassifikation",
        "alternateName": ["BKL", "BK"],
        "sameAs": "https://www.wikidata.org/wiki/Q29938469",
        "CategoryCodes": [
            {
                "@type": "CategoryCode",
                "@id": "http://uri.gbv.de/terminology/bk/",
                "codeValue": None,
            }
        ],
    },
    "rvk": {
        "@type": "CategoryCodeSet",
        "@id": "https://rvk.uni-regensburg.de/regensburger-verbundklassifikation-online",
        "name": "Regensburger Verbundklassifikation",
        "alternateName": [
            "RVK",
            "Regensburger Systematik",
            "RVKO",
            "Regensburg RVK",
            "Regensburg Classification",
        ],
        "sameAs": "http://www.wikidata.org/wiki/Q2137453",
        "CategoryCodes": [
            {
                "@type": "CategoryCode",
                "@id": "https://rvk.uni-regensburg.de/regensburger-verbundklassifikation-online#notation/",
                "codeValue": None,
            }
        ],
    },
    "082.0_": {
        "@type": "CategoryCodeSet",
        "name": "Dewey Decimal Classification",
        "alternateName": "DDC",
        "sameAs": "http://www.wikidata.org/wiki/Q48460",
        "CategoryCodes": [{"@type": "CategoryCode", "codeValue": None}],
    },
    "082.04": {
        "@type": "CategoryCodeSet",
        "name": "DDC-Sachgruppen der DNB ab 2004",
        "alternateName": [
            "Sachgruppen der DNB ab 2004",
            "SDNB ab 2004",
            "Systematik der Deutschen Nationalbibliografie ab 2004",
            "DNB-Sachgruppen ab 2004",
            "Sachgruppen der Deutschen Nationalbibliografie ab 2004",
        ],
        "sameAs": "https://www.wikidata.org/wiki/Q67011877",
        "CategoryCodes": [{"@type": "CategoryCode", "codeValue": None}],
    },
    "050._0": {
        "@type": "CategoryCodeSet",
        "@id": "https://id.loc.gov/authorities/classification",
        "name": "Library of Congress Classification",
        "alternateName": "LCC",
        "sameAs": "https://wikidata.org/wiki/Q621080",
        "CategoryCodes": [
            {
                "@type": "CategoryCode",
                "@id": "https://id.loc.gov/authorities/classification/",
                "codeValue": None,
            }
        ],
    },
}
