"""Enrichment bots as dataset joins (reference /root/reference/enrichment/*).

The reference bots make one HTTP round-trip per record (the scalability
anti-pattern SURVEY.md §3.3 calls out). Here each bot is re-expressed as:

  1. JVM-side join-key extraction from the record JSON (from_json + array
     expressions — no Python), e.g. the GND id from the sameAs list;
  2. a dataset join against a locally-provided authority table standing in
     for the HTTP API (broadcast when small, AQE decides otherwise — the
     GND full dump is ~40M records, so no forced broadcast anywhere);
  3. a record-local merge in an Arrow-batched mapInPandas stage that ports
     the reference bot's mutation logic verbatim (litter semantics via
     marc.records.merge_value) — no cross-record state, so it pipelines.

Each bot returns (record_id, doc) for CHANGED records only — the reference
bots' stdout contract (they print enriched records; `-pipeline` echoes the
rest unchanged, which callers get by left-joining this output back).

Parity: tests/test_bots.py runs the ACTUAL reference bot code with a fake
``requests`` against the same fixture payloads and asserts equal output.

Authority dataset schemas (the HTTP stand-ins):
  entityfacts    ef:             (gnd_id string, ef_same_as string JSON)
  wikidata       wd:             (property string, value string, wd_uri string)
  gnd_sachgruppen gnd_records:   (gnd_id string, src string JSON)
                  gnd_subjects:  (subject_id string, pref_label string)
  wikipedia      sitelinks:      (wd_id string, site string, url string,
                                  title string)
  wp categories  category_pages: (cc string, wp_title string,
                                  page_id long, page_title string)
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from esmarc_spark.marc.records import merge_value

OUT_SCHEMA = "record_id string, doc string"

# ---------------------------------------------------------------------------
# ported reference dims
# ---------------------------------------------------------------------------

# GND EntityFacts provider abbreviation -> SLUB LOD organization id
# (None = known provider without a SLUB org) — ref entityfacts.py:43-74
ENTITYFACTS_PROVIDERS: dict[str, str | None] = {
    "DNB": "https://data.slub-dresden.de/organizations/514366265",
    "VIAF": "https://data.slub-dresden.de/organizations/100092306",
    "LC": "https://data.slub-dresden.de/organizations/100822142",
    "DDB": "https://data.slub-dresden.de/organizations/824631854",
    "WIKIDATA": "https://www.wikidata.org/wiki/Q2013",
    "BNF": "https://data.slub-dresden.de/organizations/188898441",
    "KXP": "https://data.slub-dresden.de/organizations/103302212",
    "dewiki": None,
    "enwiki": None,
    "DE-611": "https://data.slub-dresden.de/organizations/103675612",
    "geonames": None,
    "ISNI": None,
    "filmportal.de": None,
    "ORCID": None,
    "Portraitindex": None,
    "ARCHIV-D": None,
    "DE-M512": None,
    "ADB": None,
    "NDB": None,
    "OEBL": "https://data.slub-dresden.de/organizations/102972389",
    "CH_HLS": None,
    "LAGIS": "https://data.slub-dresden.de/organizations/100482600",
    "WIKISOURCE": None,
    "DE-28": "https://data.slub-dresden.de/organizations/100874770",
    "OSTDEBIB": None,
    "PACELLI": None,
    "FFMPL": "https://data.slub-dresden.de/organizations/236770764",
    "epidat": "https://data.slub-dresden.de/organizations/103039031",
    "BIOKLASOZ": "https://data.slub-dresden.de/organizations/100832873",
    "HISTORICUMNET": "https://data.slub-dresden.de/organizations/102398704",
}

# identifier-system URL prefix -> wikidata property + id delimiter
# — ref wikidata.py:10-30
WIKIDATA_PROPERTIES: dict[str, dict[str, str]] = {
    "http://viaf.org": {"property": "P214", "delim": "/"},
    "https://d-nb.info/gnd": {"property": "P227", "delim": "/"},
    "http://isni.org": {"property": "P213", "delim": "/"},
    "http://id.loc.gov": {"property": "P244", "delim": "/"},
    "https://deutsche-digitale-bibliothek.de": {"property": "P4948", "delim": "/"},
    "http://catalogue.bnf.fr/ark": {"property": "P268", "delim": "/cb"},
    "http://geonames.org": {"property": "P1566", "delim": "/"},
    "http://filmportal.de/person": {"property": "P2639", "delim": "/"},
    "http://orcid.org": {"property": "P496", "delim": "/"},
    "http://swb.bsz-bw.de/DB=2.1/PPNSET?PPN=": {"property": "P1044", "delim": "="},
}

# which wikipedias to enrich — ref wikipedia.py:27-45
WP_SITES: dict[str, dict[str, str]] = {
    "cswiki": {"abbr": "cswiki", "preferredName": "Wikipedia (Tschechisch)"},
    "dewiki": {"abbr": "dewiki", "preferredName": "Wikipedia (Deutsch)"},
    "plwiki": {"abbr": "plwiki", "preferredName": "Wikipedia (Polnisch)"},
    "enwiki": {"abbr": "enwiki", "preferredName": "Wikipedia (Englisch)"},
}

# providers whose wikipedia links are replaced on update — ref wikipedia.py:25
OBSOLETE_ISBASEDONS = ["hub.culturegraph.org"]

# the four GND fields the Sachgruppen bot maps — ref gnd_sachgruppen.py:9-12
SACHGRUPPEN_FIELDS = [
    "gndSubjectCategory",
    "fieldOfStudy",
    "fieldOfActivity",
    "biographicalOrHistoricalInformation",
]

# ---------------------------------------------------------------------------
# JVM-side key extraction
# ---------------------------------------------------------------------------

_SAMEAS_SCHEMA = T.StructType(
    [
        T.StructField(
            "sameAs",
            T.ArrayType(T.StructType([T.StructField("@id", T.StringType())])),
        )
    ]
)


def same_as_ids(doc_col: F.Column) -> F.Column:
    """array<string> of the record's sameAs @ids (empty when absent)."""
    ids = F.transform(
        F.from_json(doc_col, _SAMEAS_SCHEMA)["sameAs"], lambda x: x["@id"]
    )
    return F.coalesce(
        F.filter(ids, lambda i: i.isNotNull()), F.array().cast("array<string>")
    )


def gnd_id_of(doc_col: F.Column) -> F.Column:
    """LAST sameAs id containing d-nb.info with >4 slash-separated parts,
    final path segment — ref entityfacts.py:79-82 / gnd_sachgruppen.py:141-146
    (the loop overwrites, so the last match wins).

    ``try_element_at``: under Spark 4's default ANSI mode a plain
    ``element_at`` on the empty match array ABORTS the job
    (INVALID_ARRAY_INDEX_IN_ELEMENT_AT) before any isNotNull guard runs;
    records without a d-nb.info sameAs must yield NULL and be skipped, as
    the reference does (entityfacts.py:84-86)."""
    matches = F.filter(
        same_as_ids(doc_col),
        lambda i: i.contains("d-nb.info") & (F.size(F.split(i, "/")) > 4),
    )
    return F.element_at(F.split(F.try_element_at(matches, F.lit(-1)), "/"), -1)


def _merged(
    joined: DataFrame, merge_one, payload_cols: list[str]
) -> DataFrame:
    """Arrow-batched merge stage: (record_id, doc, *payload) -> changed
    (record_id, doc) rows via the bot's record-local reference logic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_docs = [], []
            # explicit column zip (itertuples mangles _-prefixed names)
            series = [pdf["record_id"], pdf["doc"]] + [pdf[c] for c in payload_cols]
            for rid, doc, *payload in zip(*series):
                merged = merge_one(json.loads(doc), *payload)
                if merged is not None:
                    out_ids.append(rid)
                    out_docs.append(json.dumps(merged, ensure_ascii=False))
            yield pd.DataFrame({"record_id": out_ids, "doc": out_docs})

    return joined.mapInPandas(run, schema=OUT_SCHEMA)


# ---------------------------------------------------------------------------
# EntityFacts
# ---------------------------------------------------------------------------


def _ef_merge(doc: dict, gnd_id: str, ef_same_as_json: str) -> dict | None:
    """Port of ref entityfacts.py:76-154 (one ef instance, HTTP replaced by
    the joined payload)."""
    if not isinstance(doc.get("sameAs"), list):
        return None
    old_len = len(str(doc["sameAs"]))
    same_asses = []
    for same_as in json.loads(ef_same_as_json):
        id_ = same_as.get("@id")
        if not id_ or id_.startswith("https://d-nb.info"):
            continue
        obj = {
            "@id": id_,
            "publisher": {
                "abbr": same_as["collection"]["abbr"],
                "preferredName": same_as["collection"]["name"],
            },
            "isBasedOn": {
                "@type": "Dataset",
                "@id": f"http://hub.culturegraph.org/entityfacts/{gnd_id}",
            },
        }
        abbr = obj["publisher"]["abbr"]
        if abbr in ENTITYFACTS_PROVIDERS:
            slub_id = ENTITYFACTS_PROVIDERS[abbr]
            if slub_id:
                obj["publisher"]["@id"] = slub_id
        same_asses.append(obj)
    if same_asses:
        doc["sameAs"] = merge_value(doc.get("sameAs"), same_asses)
    return doc if len(str(doc["sameAs"])) > old_len else None


def enrich_entityfacts(records: DataFrame, ef: DataFrame) -> DataFrame:
    """records(record_id, doc) ⋈ ef(gnd_id, ef_same_as) on the record's GND
    id; returns changed records only."""
    keyed = records.withColumn("_gnd", gnd_id_of(F.col("doc"))).where(
        F.col("_gnd").isNotNull()
    )
    joined = keyed.join(ef, keyed["_gnd"] == ef["gnd_id"], "inner").select(
        "record_id", "doc", "gnd_id", "ef_same_as"
    )
    return _merged(joined, _ef_merge, ["gnd_id", "ef_same_as"])


# ---------------------------------------------------------------------------
# Wikidata
# ---------------------------------------------------------------------------


def _wd_merge(doc: dict, wd_uris: list) -> dict | None:
    """Port of ref wikidata.py:66-81 (SPARQL result -> sameAs entries)."""
    changed = False
    for uri in wd_uris:
        doc["sameAs"] = merge_value(
            doc.get("sameAs"),
            {
                "@id": uri,
                "publisher": {
                    "@id": "https://www.wikidata.org/wiki/Q2013",
                    "abbr": "WIKIDATA",
                    "preferredName": "Wikidata",
                },
                "isBasedOn": {"@type": "Dataset", "@id": uri},
            },
        )
        changed = True
    return doc if changed else None


def enrich_wikidata(records: DataFrame, wd: DataFrame) -> DataFrame:
    """records ⋈ wd(property, value, wd_uri).

    JVM side maps every sameAs id through the 10-system P-code dim (first
    matching prefix per id — ref wikidata.py:51-56 breaks on first match),
    explodes the (property, value) pairs, joins, and re-groups matched
    records. Records already carrying any wikidata.org reference in their
    sameAs are skipped — the reference's stdin path tests the WHOLE
    serialized sameAs (`"wikidata.org" in str(rec["sameAs"])`,
    wikidata.py:121-123), which also catches WIKIDATA-published entries
    whose @id points elsewhere; mirrored here on the raw JSON slice."""
    import re as _re

    ids = same_as_ids(F.col("doc"))
    not_enriched = ~F.coalesce(
        F.get_json_object(F.col("doc"), "$.sameAs").contains("wikidata.org"),
        F.lit(False),
    )

    def pair_of(i: F.Column) -> F.Column:
        expr = F.lit(None).cast("struct<property:string,value:string>")
        # reverse order: earlier dim entries win, mirroring the dict-order
        # break in the reference loop
        for key, spec in reversed(list(WIKIDATA_PROPERTIES.items())):
            expr = F.when(
                i.startswith(key),
                F.struct(
                    F.lit(spec["property"]).alias("property"),
                    F.element_at(
                        F.split(i, _re.escape(spec["delim"])), -1
                    ).alias("value"),
                ),
            ).otherwise(expr)
        return expr

    pairs = F.filter(
        F.transform(ids, pair_of), lambda p: p.isNotNull()
    )
    keyed = (
        records.where(not_enriched)
        .withColumn("_p", F.explode(pairs))
        .select(
            "record_id",
            "doc",
            F.col("_p.property").alias("property"),
            F.col("_p.value").alias("value"),
        )
    )
    joined = keyed.join(wd, ["property", "value"], "inner")
    grouped = joined.groupBy("record_id", "doc").agg(
        F.sort_array(F.collect_list("wd_uri")).alias("wd_uris")
    )
    return _merged(grouped, _wd_merge, ["wd_uris"])


# ---------------------------------------------------------------------------
# GND Sachgruppen
# ---------------------------------------------------------------------------


def _normalize_item(elem):
    """ref gnd_sachgruppen.py:24-34: str -> {'id': str}; dict needs 'id';
    lists skipped. Returns (newvalue, value) or None."""
    if isinstance(elem, str):
        elem = {"id": elem}
    if isinstance(elem, dict):
        if "id" in elem:
            return elem["id"].split("/")[-1], elem["id"]
        return None
    return None


def _sach_merge(doc: dict, src_json: str, fos_json: str, subj_json: str) -> dict | None:
    """Port of ref gnd_sachgruppen.py:15-87 with the two nested HTTP lookups
    (fieldOfStudy record, gnd-subjects search) replaced by joined maps."""
    src = json.loads(src_json)
    fos_map = json.loads(fos_json) if fos_json else {}
    subj_map = json.loads(subj_json) if subj_json else {}
    change = False
    for gnd_item in SACHGRUPPEN_FIELDS:
        if not src.get(gnd_item):
            continue
        for elem in src[gnd_item]:
            norm = _normalize_item(elem)
            if norm is None:
                continue
            newvalue, value = norm
            newabout = {
                "identifier": {
                    "propertyID": gnd_item,
                    "@type": "PropertyValue",
                    "value": newvalue,
                }
            }
            if value.startswith("http"):
                newabout["@id"] = value
            if gnd_item == "fieldOfStudy":
                fos_src = fos_map.get(newvalue)
                ddcs = (fos_src or {}).get("relatedDdcWithDegreeOfDeterminacy3")
                if fos_src and ddcs:
                    newabout["identifier"] = [newabout.pop("identifier")]
                    if isinstance(ddcs, dict):
                        ddcs = [ddcs]
                    if isinstance(ddcs, list):
                        for ddc in ddcs:
                            if isinstance(ddc, str):
                                ddc = {"id": ddc}
                            newabout["identifier"].append(
                                {
                                    "@type": "PropertyValue",
                                    "propertyID": "DDC",
                                    "value": ddc.get("id").split("/")[-2][:3],
                                }
                            )
                            newabout["@id"] = ddc.get("id")  # last ddc wins
                    if fos_src.get("preferredNameForTheSubjectHeading"):
                        newabout["name"] = fos_src["preferredNameForTheSubjectHeading"]
            elif gnd_item == "gndSubjectCategory":
                if value in subj_map:
                    # whitespace-collapsed label (ref :66-67)
                    newabout["name"] = " ".join(
                        subj_map[value].replace("\n", "").split()
                    )
            if not doc.get("about"):
                doc["about"] = newabout
                change = True
            else:
                plz_add = True
                about = doc["about"]
                if (
                    isinstance(about, dict)
                    and about.get("@id")
                    and value not in about["@id"]
                ):
                    doc["about"] = [doc.pop("about")]
                elif isinstance(about, list):
                    for item in about:
                        if item.get("@id") and value in item["@id"]:
                            plz_add = False
                        elif isinstance(item.get("identifier"), list):
                            for ident in item["identifier"]:
                                if ident.get("@id") and value in ident["@id"]:
                                    plz_add = False
                if plz_add:
                    change = True
                    doc["about"] = merge_value(doc["about"], newabout)
    return doc if change else None


_SRC_IDS_SCHEMA = T.StructType(
    [
        T.StructField(
            f,
            T.ArrayType(T.StructType([T.StructField("id", T.StringType())])),
        )
        for f in SACHGRUPPEN_FIELDS
    ]
)
_SRC_STR_SCHEMA = T.StructType(
    [T.StructField(f, T.ArrayType(T.StringType())) for f in SACHGRUPPEN_FIELDS]
)


def _field_ids(src_col: F.Column, field: str) -> F.Column:
    """ids of one Sachgruppen field, supporting both the {'id': ...} object
    shape and the bare-string shape (the merge stage re-derives everything
    from src, so this only feeds candidate JOIN keys)."""
    objs = F.transform(
        F.from_json(src_col, _SRC_IDS_SCHEMA)[field], lambda x: x["id"]
    )
    strs = F.from_json(src_col, _SRC_STR_SCHEMA)[field]
    return F.coalesce(objs, strs, F.array().cast("array<string>"))


def enrich_sachgruppen(
    records: DataFrame, gnd_records: DataFrame, gnd_subjects: DataFrame
) -> DataFrame:
    """records ⋈ gnd_records(gnd_id, src) ⋈ (nested) gnd_records for
    fieldOfStudy DDC ⋈ gnd_subjects(subject_id, pref_label).

    Three dataset joins replace the reference's 1 + #fieldOfStudy +
    #gndSubjectCategory HTTP calls per record; the about-dedup (anti-join
    semantics vs the existing `about`) runs in the merge stage exactly as
    ref :69-86."""
    keyed = records.withColumn("_gnd", gnd_id_of(F.col("doc"))).where(
        F.col("_gnd").isNotNull()
    )
    base = keyed.join(
        gnd_records.select(
            F.col("gnd_id").alias("_gnd"), F.col("src").alias("_src")
        ),
        "_gnd",
        "inner",
    )

    # nested join 1: fieldOfStudy id (last segment) -> that GND record's src
    fos_keys = F.transform(
        _field_ids(F.col("_src"), "fieldOfStudy"),
        lambda i: F.element_at(F.split(i, "/"), -1),
    )
    fos_pairs = (
        base.select("record_id", F.explode(fos_keys).alias("fos_key"))
        .dropDuplicates(["record_id", "fos_key"])
        .join(
            gnd_records.select(
                F.col("gnd_id").alias("fos_key"), F.col("src").alias("fos_src")
            ),
            "fos_key",
            "inner",
        )
        .groupBy("record_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("fos_key", "fos_src")))
            ).alias("_fos_map")
        )
    )

    # nested join 2: gndSubjectCategory full id -> prefLabel
    subj_pairs = (
        base.select(
            "record_id",
            F.explode(_field_ids(F.col("_src"), "gndSubjectCategory")).alias(
                "subject_id"
            ),
        )
        .dropDuplicates(["record_id", "subject_id"])
        .join(gnd_subjects, "subject_id", "inner")
        .groupBy("record_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("subject_id", "pref_label")))
            ).alias("_subj_map")
        )
    )

    joined = (
        base.join(fos_pairs, "record_id", "left")
        .join(subj_pairs, "record_id", "left")
        .select(
            "record_id",
            "doc",
            "_src",
            F.to_json(F.coalesce("_fos_map", F.expr("map()"))).alias("_fos"),
            F.to_json(F.coalesce("_subj_map", F.expr("map()"))).alias("_subj"),
        )
    )

    def merge(doc, src, fos, subj):
        # fos map values are JSON strings of the nested record src
        fos_map = {k: json.loads(v) for k, v in json.loads(fos or "{}").items()}
        return _sach_merge(doc, src, json.dumps(fos_map), subj or "{}")

    return _merged(joined, merge, ["_src", "_fos", "_subj"])


# ---------------------------------------------------------------------------
# Wikipedia sitelinks
# ---------------------------------------------------------------------------


def _build_abbrevs(same_asses: list) -> dict:
    """Port of ref wikipedia.py:48-66."""
    abbrevs = {}
    for n, same_as in enumerate(same_asses):
        host = urlparse(same_as["isBasedOn"]["@id"]).hostname
        abbrevs[same_as["publisher"]["abbr"]] = {"host": host, "pos": n}
    return abbrevs


def _wp_merge(doc: dict, wd_uri: str, sites_json: str) -> dict | None:
    """Port of ref wikipedia.py:69-160: append new wikipedia sameAs links,
    REPLACE ones whose provenance is obsolete, enrich multilingual names."""
    sites = json.loads(sites_json)
    abbrevs = _build_abbrevs(doc["sameAs"])
    changed = False
    for wp_abbr in sorted(sites):  # deterministic site order
        info = sites[wp_abbr]
        if wp_abbr not in WP_SITES:
            continue
        new_same_as = {
            "@id": info["url"],
            "publisher": WP_SITES[wp_abbr],
            "isBasedOn": {"@type": "Dataset", "@id": wd_uri},
        }
        if wp_abbr not in abbrevs:
            doc["sameAs"].append(new_same_as)
            changed = True
        elif abbrevs.get(wp_abbr) and abbrevs[wp_abbr]["host"] in OBSOLETE_ISBASEDONS:
            doc["sameAs"][abbrevs[wp_abbr]["pos"]] = new_same_as
            changed = True
        if not doc.get("name"):
            doc["name"] = {}
        cc = wp_abbr[:2]
        if cc not in doc["name"]:
            doc["name"][cc] = [info["title"]]
            changed = True
        if info["title"] not in doc["name"][cc]:
            doc["name"][cc] = merge_value(doc["name"][cc], info["title"])
            changed = True
    return doc if changed else None


def enrich_wikipedia_sitelinks(records: DataFrame, sitelinks: DataFrame) -> DataFrame:
    """records ⋈ sitelinks(wd_id, site, url, title) on the record's FIRST
    wikidata sameAs id (ref wikipedia.py:86-91 breaks on first match)."""
    ids = same_as_ids(F.col("doc"))
    # try_element_at: ANSI mode errors on element_at(empty, 1) — a record
    # with no wikidata sameAs must fall through to the isNotNull filter
    # (ref wikipedia.py:91-92 skips such records)
    wd_uri = F.try_element_at(
        F.filter(ids, lambda i: i.contains("wikidata")), F.lit(1)
    )
    keyed = (
        records.withColumn("_wd_uri", wd_uri)
        .where(F.col("_wd_uri").isNotNull())
        .withColumn("_wd_id", F.element_at(F.split(F.col("_wd_uri"), "/"), -1))
    )
    joined = keyed.join(
        sitelinks.withColumnRenamed("wd_id", "_wd_id"), "_wd_id", "inner"
    ).dropDuplicates(["record_id", "site"])
    grouped = joined.groupBy("record_id", "doc", "_wd_uri").agg(
        F.to_json(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("site"),
                            F.struct(F.col("url"), F.col("title")),
                        )
                    )
                )
            )
        ).alias("_sites")
    )
    return _merged(grouped, _wp_merge, ["_wd_uri", "_sites"])


# ---------------------------------------------------------------------------
# Wikipedia categories
# ---------------------------------------------------------------------------


def _wpcat_merge(doc: dict, links_json: str) -> dict | None:
    """Port of ref wikipedia_categories.py:21-84: one category object per
    joined category page, accumulated per wikipedia country code in sameAs
    order. Pages are looked up PER LINK (cc, title): a link whose title
    joined zero category pages mirrors the reference's pages-less API
    response — KeyError at ref :64 → None for the WHOLE record, discarding
    categories from its other links (all-or-nothing)."""
    import urllib.parse

    by_link = {
        (l["cc"], l["wp_title"]): l["pages"] for l in json.loads(links_json)
    }
    retobj: dict = {}
    changed = False
    for _id in [x["@id"] for x in doc["sameAs"]]:
        if "wikipedia" not in _id:
            continue
        parts = _id.split("/")
        if len(parts) < 4:
            # malformed link: skipped plan-side too (the reference
            # IndexErrors here — robustness divergence, see caller)
            continue
        seg = parts[-1]
        wp_title = urllib.parse.unquote(seg)
        cc = parts[2].split(".")[0]
        pages = by_link.get((cc, wp_title)) or by_link.get((cc, seg))
        if not pages:
            return None
        base = f"https://{cc}.wikipedia.org/wiki/"
        for page in pages:
            obj = {
                "@id": base + "?curid={}".format(page["page_id"]),
                "sameAs": base + page["page_title"].replace(" ", "_"),
                "name": ":".join(page["page_title"].split(":")[1:]),
            }
            retobj[cc] = merge_value(retobj.get(cc), obj)
            changed = True
    if changed:
        doc["category"] = retobj
        return doc
    return None


def enrich_wikipedia_categories(
    records: DataFrame, category_pages: DataFrame
) -> DataFrame:
    """records ⋈ category_pages(cc, wp_title, page_id, page_title) on every
    wikipedia sameAs link (cc + url-decoded title), pages kept PER LINK so
    the merge can mirror the reference's all-or-nothing KeyError semantics
    (a barren title drops the whole record — ref :74-78).

    ``try_url_decode``: ANSI mode would abort the job on a malformed
    percent-escape; the reference's ``unquote`` leaves such segments as-is,
    so fall back to the raw segment (the merge lookup tries both)."""
    ids = same_as_ids(F.col("doc"))
    # >=4 slash parts so the cc (part 3) and title (last part) segments
    # exist: a malformed id containing "wikipedia" would ANSI-abort the
    # element_at below — the reference crashes outright on such ids
    # (wikipedia_categories.py:38-39 IndexError); we skip them instead
    # (documented robustness divergence, mirrored in _wpcat_merge)
    wps = F.filter(
        ids,
        lambda i: i.contains("wikipedia") & (F.size(F.split(i, "/")) >= 4),
    )
    links = F.transform(
        wps,
        lambda i: F.struct(
            F.split(F.element_at(F.split(i, "/"), 3), r"\.")[0].alias("cc"),
            F.coalesce(
                F.try_url_decode(F.element_at(F.split(i, "/"), -1)),
                F.element_at(F.split(i, "/"), -1),
            ).alias("wp_title"),
        ),
    )
    keyed = (
        records.withColumn("_l", F.explode(links))
        .select(
            "record_id",
            "doc",
            F.col("_l.cc").alias("cc"),
            F.col("_l.wp_title").alias("wp_title"),
        )
        .dropDuplicates(["record_id", "cc", "wp_title"])
    )
    joined = keyed.join(category_pages, ["cc", "wp_title"], "inner")
    grouped = (
        joined.groupBy("record_id", "doc", "cc", "wp_title")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("page_id", "page_title"))
            ).alias("_pages")
        )
        .groupBy("record_id", "doc")
        .agg(
            F.to_json(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "cc", "wp_title", F.col("_pages").alias("pages")
                        )
                    )
                )
            ).alias("_links")
        )
    )
    return _merged(grouped, _wpcat_merge, ["_links"])


# ---------------------------------------------------------------------------
# GeoNames
# ---------------------------------------------------------------------------

_GEO_SCHEMA = T.StructType(
    [
        T.StructField(
            "geo",
            T.StructType(
                [
                    T.StructField("latitude", T.StringType()),
                    T.StructField("longitude", T.StringType()),
                ]
            ),
        )
    ]
)


def _gn_merge(doc: dict, candidates_json: str) -> dict | None:
    """Port of ref geonames.py:47-79 (get_gnid_by_es) with the ES
    geo_distance query replaced by the joined candidate list.

    Faithful quirks: the already-enriched check tests the geonames URL
    against each sameAs ELEMENT with `in` — a dict-keys test for node
    objects, so it only ever skips records whose sameAs carries plain
    strings (ref :51); `len(records) == 1` reads a list that is never
    appended to, i.e. always False (ref :58) — both preserved."""
    # `or []`: a record with geo coordinates but no sameAs at all would
    # TypeError here (the reference crashes the same way, geonames.py:51
    # iterating None — robustness divergence); it proceeds to be enriched
    if any("http://www.geonames.org" in s for s in doc.get("sameAs") or []):
        return None
    changed = False
    for record in json.loads(candidates_json):
        if (
            record.get("name") in doc.get("preferredName")
            or doc.get("preferredName") in record.get("name")
            or False  # ref :58 `len(records) == 1` — records never appended
            or doc.get("preferredName") in record.get("alternateName")
        ):
            new_same_as = {
                "@id": "https://sws.geonames.org/" + str(record.get("id")) + "/",
                "publisher": {
                    "abbr": "geonames",
                    "preferredName": "GeoNames",
                    "isBasedOn": {
                        "@type": "Dataset",
                        "@id": "https://sws.geonames.org/" + str(record.get("id")) + "/",
                    },
                },
            }
            doc["sameAs"] = merge_value(doc.get("sameAs"), new_same_as)
            changed = True
    return doc if changed else None


def enrich_geonames(
    records: DataFrame, geonames: DataFrame, radius_km: float = 0.1
) -> DataFrame:
    """records ⋈ geonames(id, name, alternate_names, lat, lon) within
    ``radius_km`` — the grid-cell + haversine spatial join from
    enrichment.spatial_enrich feeding the reference bot's exact merge
    (name-containment conditions evaluated per candidate, in id order).

    geonames schema: (id string, name string, alternate_names
    array<string>, lat double, lon double).

    Caller-level gate: both reference paths exclude already-enriched
    records BEFORE the bot runs (stdin: ``"geonames" in str(rec[sameAs])``
    geonames.py:129; ES: must_not prefix filters on sws./www.geonames @ids
    geonames.py:137) — mirrored here on the raw sameAs JSON slice, like
    the wikidata bot's gate. The in-merge quirk check (ref :51) stays as
    the faithful no-op it is."""
    from esmarc_spark.pipeline.enrichment import _cell, _haversine_km

    not_enriched = ~F.coalesce(
        F.get_json_object(F.col("doc"), "$.sameAs").contains("geonames"),
        F.lit(False),
    )
    records = records.where(not_enriched)
    g = F.from_json(F.col("doc"), _GEO_SCHEMA)["geo"]
    keyed = (
        records.withColumn("_lat", g["latitude"].cast("double"))
        .withColumn("_lon", g["longitude"].cast("double"))
        .where(F.col("_lat").isNotNull() & F.col("_lon").isNotNull())
    )
    cell_deg = radius_km / 111.0
    gaz = geonames.withColumn(
        "_cell", _cell(F.col("lat"), F.col("lon"), cell_deg)
    )
    lat_band = F.least(F.abs(F.col("_lat")) + F.lit(cell_deg), F.lit(85.0))
    kx = F.ceil(F.lit(1.0) / F.cos(F.radians(lat_band))).cast("int")
    shifts = F.flatten(
        F.transform(
            F.sequence(F.lit(-1), F.lit(1)),
            lambda dy: F.transform(
                F.sequence(-kx, kx),
                lambda dx: F.struct(dy.alias("dy"), dx.alias("dx")),
            ),
        )
    )
    probes = (
        keyed.withColumn("_base", _cell(F.col("_lat"), F.col("_lon"), cell_deg))
        .withColumn("_s", F.explode(shifts))
        .withColumn(
            "_cell",
            F.struct(
                (F.col("_base.cy") + F.col("_s.dy")).alias("cy"),
                (F.col("_base.cx") + F.col("_s.dx")).alias("cx"),
            ),
        )
        .drop("_base", "_s")
    )
    near = (
        probes.join(gaz, "_cell")
        .where(
            _haversine_km(F.col("_lat"), F.col("_lon"), F.col("lat"), F.col("lon"))
            <= radius_km
        )
        .dropDuplicates(["record_id", "id"])
    )
    grouped = near.groupBy("record_id", "doc").agg(
        F.to_json(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("id"),
                        F.col("name"),
                        F.col("alternate_names").alias("alternateName"),
                    )
                )
            )
        ).alias("_cands")
    )
    return _merged(grouped, _gn_merge, ["_cands"])
