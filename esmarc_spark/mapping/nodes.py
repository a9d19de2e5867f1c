"""Typed-node extractors, wave 2: contributors, titles, subfield nodes,
language lookups, footnotes, collections, usage/physical/offers, relations.

Semantics parity (documented, not copied):
  * contributor         ≈ /root/reference/esmarc/namings.py:53-119
  * title object        ≈ /root/reference/esmarc/namings.py:122-293
  * topic preferredName ≈ /root/reference/esmarc/namings.py:33-50
  * subfield node       ≈ /root/reference/esmarc/subfields.py:9-125
  * language lookup     ≈ /root/reference/esmarc/language.py:5-39
  * footnotes           ≈ /root/reference/esmarc/footnotes.py:8-58
  * collections/usage/physical/offers ≈ /root/reference/esmarc/catalogue.py
  * editions            ≈ /root/reference/esmarc/editions.py
  * relatedTo           ≈ /root/reference/esmarc/relatedTo.py:156-192
"""

from __future__ import annotations

from typing import Any

from esmarc_spark.lookups.data_tables import (
    COLLECTION_LABELS,
    FOOTNOTE_TEMPLATES,
    K10PLUS_TO_ISO,
    LANGUAGE_LABELS,
    RELATION_PHRASES,
    ROLE_LABELS,
    SSG_FID_LABELS,
)
from esmarc_spark.lookups.dims import ENTITY_DISPATCH, SCHEMA_TYPES, TARGET_ID
from esmarc_spark.mapping.extractors import _as_list, authority_uri, mint_id
from esmarc_spark.marc.records import (
    collapse,
    field_values,
    merge_value,
    occurrence_maps,
)

BASE_ID = "(DE-627)"


# ---------------------------------------------------------------------------
# contributors (100/110/111/700/710/711)
# ---------------------------------------------------------------------------


def build_contributors(record: dict, keys: list, entity: str) -> list | None:
    out = []
    for tag in keys:
        for smap in occurrence_maps(record, tag, "*"):
            node: dict[str, Any] = {}
            order = None
            if (tag == "110" and not smap.get("c")) or (
                tag == "710" and not smap.get("t")
            ):
                node["@type"] = "Organization"
                if smap.get("0"):
                    node["@id"] = f"{TARGET_ID}organizations/"
                order = ["a", "b", "g"]
            elif (
                (tag == "110" and smap.get("c"))
                or (tag == "711" and not smap.get("t"))
                or tag == "111"
            ):
                node["@type"] = "Event"
                node["@id"] = f"{TARGET_ID}events/"
                node["name"] = ""
                order = ["a", "n", "d", "c", "e", "g"]
            elif tag in ("100", "700") and not smap.get("t"):
                node["@type"] = "Person"
                if smap.get("0"):
                    node["@id"] = f"{TARGET_ID}persons/"
                name = ""
                a = smap.get("a")
                if isinstance(a, str):
                    name += a
                elif isinstance(a, list) and a:
                    name += a[0]
                b = smap.get("b")
                if isinstance(b, str):
                    name += " " + b
                c = smap.get("c")
                if isinstance(c, str):
                    name += ", " + c
                elif isinstance(c, list):
                    name += ", " + ", ".join(c)
                node["name"] = name
            if order:
                # reference parity (namings.py:87-94): the part is
                # ``value[0]`` — first ELEMENT of a list but first CHARACTER
                # of a plain string (a reference quirk we reproduce exactly)
                parts = [smap[code][0] for code in order if code in smap]
                node["name"] = ", ".join(parts)
            for item in _as_list(smap.get("0") or []):
                if item.startswith("(DE-627)") and node.get("@id"):
                    node["@id"] += item.partition(")")[2]
                if item.startswith("(DE-588)"):
                    node["sameAs"] = "https://d-nb.info/gnd/" + item.partition(")")[2]
            for code in _as_list(smap.get("4") or []):
                labels = ROLE_LABELS.get(code)
                if labels and labels[1]:
                    node.setdefault("roles", []).append(
                        {
                            "@type": "Role",
                            "@id": f"https://id.loc.gov/vocabulary/relators/{code}",
                            "name": labels[1],
                        }
                    )
            out.append(node)
    return out or None


# ---------------------------------------------------------------------------
# topic preferredName (150: $a + " / $x"* + " ($g)"*)
# ---------------------------------------------------------------------------


def build_topic_name(record: dict, key: str, entity: str) -> str | None:
    name = ""
    for occ in record.get(key) or []:
        if not isinstance(occ, dict):
            continue
        for subfields in occ.values():
            for cell in subfields:
                for code, value in cell.items():
                    if code == "a":
                        name = value
                    elif code == "x":
                        name += f" / {value}"
                    elif code == "g":
                        name += f" ({value})"
    return name or None


# ---------------------------------------------------------------------------
# title object (245 + parallel/short/varying/former/uniform titles)
# ---------------------------------------------------------------------------


def build_title(record: dict, keys: list, entity: str) -> dict | None:
    title: dict[str, Any] = {}

    par_a = par_b = None
    for smap in occurrence_maps(record, "246", "31"):
        node = {}
        if smap.get("a"):
            node["mainTitle"] = smap["a"]
            par_a = smap["a"]
        if smap.get("b"):
            node["subTitle"] = smap["b"]
            par_b = smap["b"]
        if smap.get("a") and smap.get("b"):
            node["preferredName"] = f"{smap['a']} : {smap['b']}"
        if node:
            title["parallelTitles"] = merge_value(title.get("parallelTitles"), node)

    for smap in occurrence_maps(record, "245", "*"):
        title["preferredName"] = ""
        if smap.get("a"):
            title["preferredName"] += smap["a"]
            title["mainTitle"] = smap["a"]
        if smap.get("b"):
            b = smap["b"]
            if par_a and par_a in b:
                b = b.replace(f" = {par_a}", "")
            if par_b and par_b in b:
                b = b.replace(f" : {par_b}", "")
            title["preferredName"] += f" : {b}"
            title["subTitle"] = b
        if smap.get("n"):
            title["partStatement"] = list(_as_list(smap["n"]))
        if smap.get("p"):
            parts = _as_list(smap["p"])
            stmt = title.get("partStatement") or []
            while len(stmt) < len(parts):
                stmt.append("")
            for n, item in enumerate(parts):
                stmt[n] += f" {item}"
            title["partStatement"] = stmt
        for item in title.get("partStatement") or []:
            title["preferredName"] += ". " + item
        if smap.get("c"):
            title["preferredName"] += f" / {smap['c']}"
            title["responsibilityStatement"] = smap["c"]

    for smap in occurrence_maps(record, "249", "*"):
        node = {}
        if smap.get("a"):
            node["mainTitle"] = smap["a"]
        if smap.get("b"):
            node["subTitle"] = smap["b"]
        if smap.get("v"):
            node["responsibilityStatement"] = smap["v"]
        if smap.get("c"):
            if node.get("responsibilityStatement"):
                node["responsibilityStatement"] += f", {smap['c']}"
            else:
                node["responsibilityStatement"] = smap["c"]
        if smap.get("a"):
            a = smap["a"]
            node["preferredName"] = " ; ".join(a) if isinstance(a, list) else a
        if smap.get("v"):
            if node.get("preferredName"):
                node["preferredName"] += f" / {smap['v']}"
            else:
                node["preferredName"] = smap["v"]
        if node:
            title["otherPartsTitle"] = merge_value(title.get("otherPartsTitle"), node)

    add_info: dict[str, Any] = {}
    for smap in occurrence_maps(record, "501", "__"):
        if smap.get("a"):
            add_info["notes"] = smap["a"]
    for smap in occurrence_maps(record, "505", "80"):
        node = {}
        if smap.get("a"):
            add_info["notes"] = merge_value(add_info.get("notes"), smap["a"])
        if smap.get("t"):
            node["preferredName"] = smap["t"]
        if smap.get("r"):
            node["contributor"] = smap["r"]
        if smap.get("g"):
            node["note"] = smap["g"]
        if node:
            add_info["enclosedParts"] = merge_value(add_info.get("enclosedParts"), node)
    if add_info:
        title["additionalInfo"] = add_info

    for smap in occurrence_maps(record, "210", "10"):
        if smap.get("a"):
            title["shortTitle"] = smap["a"]

    var_titles: Any = []
    for smap in occurrence_maps(record, "246", "1_"):
        node = {}
        if smap.get("a"):
            node["preferredName"] = smap["a"]
        if smap.get("i"):
            node["disambiguatingDescription"] = smap["i"]
        if node:
            var_titles = merge_value(var_titles, node)
    for smap in occurrence_maps(record, "246", "33"):
        if smap.get("a"):
            var_titles = merge_value(var_titles, {"preferredName": smap["a"]})
    if var_titles:
        title["varyingTitles"] = var_titles

    former = []
    for smap in occurrence_maps(record, "247", "10"):
        node = {}
        if smap.get("a"):
            node["preferredName"] = smap["a"]
        if smap.get("f"):
            node["disambiguatingDescription"] = smap["f"]
        if node:
            former.append(node)
    if former:
        title["formerTitles"] = former

    uniform = []
    for tag in ["130", "240", "700", "710", "711", "730"]:
        for smap in occurrence_maps(record, tag, "*"):
            node: dict[str, Any] = {}
            if smap.get("a") and tag in ("130", "240", "730"):
                node["preferredName"] = smap["a"]
            if smap.get("t") and tag in ("700", "710", "711"):
                node["preferredName"] = smap["t"]
            if not node.get("preferredName"):
                continue
            same_as = []
            for item in _as_list(smap.get("0") or []):
                if item.startswith(BASE_ID):
                    node["@id"] = mint_id(item, "works")
                uri = authority_uri(item)
                if uri:
                    same_as.append(uri)
            if same_as:
                node["sameAs"] = same_as
            uniform.append(node)
    if uniform:
        title["uniformTitles"] = uniform

    return title or None


# ---------------------------------------------------------------------------
# subfield node builders (551^orth etc.)
# ---------------------------------------------------------------------------

_SUBFIELD_ENTITY = {
    "100": "persons", "700": "persons", "500": "persons",
    "711": "events", "110": "swb", "710": "swb",
    "551": "geo", "689": "topics", "550": "topics",
    "655": "topics", "830": "resources",
}


def build_subfield_node(record: dict, key: str, entity: str) -> Any:
    """Typed node(s) from one field; $D/$d type override, $0 id routing."""
    if isinstance(key, list):
        acc = []
        for k in key:
            acc = merge_value(acc, build_subfield_node(record, k, entity))
        return collapse(acc)
    entity_type = _SUBFIELD_ENTITY.get(key)
    data: Any = []
    for smap in occurrence_maps(record, key, "*"):
        if smap.get("t"):
            continue
        node: dict[str, Any] = {}
        for type_code in ("D", "d"):
            code = smap.get(type_code)
            if isinstance(code, str):
                if code in ENTITY_DISPATCH and code in SCHEMA_TYPES:
                    node["@type"] = "http://schema.org/" + SCHEMA_TYPES[code]
                    entity_type = ENTITY_DISPATCH[code]
        if entity_type == "resources":
            if smap.get("w") and not smap.get("0"):
                smap["0"] = smap["w"]
            if smap.get("v"):
                node["position"] = smap["v"]
        ids = smap.get("0")
        if ids:
            id_list = _as_list(ids)
            if entity_type == "persons":
                id_list = [i for i in id_list if i and "DE-576" not in i]
            resolved = []
            for item in id_list:
                if not isinstance(item, str):
                    continue
                if item.startswith(BASE_ID):
                    local = item[len(BASE_ID):]
                    if entity_type and entity_type != "resources":
                        node["@id"] = f"{TARGET_ID}{entity_type}/{local}"
                    elif entity_type == "resources":
                        node["sameAs"] = BASE_ID + local
                else:
                    # unresolvable authority prefixes are DROPPED (reference
                    # parity: gnd2uri -> None -> skipped, subfields.py:87-111)
                    uri = authority_uri(item)
                    if uri:
                        resolved.append(uri)
            if resolved:
                node["sameAs"] = collapse(resolved)
        a = smap.get("a")
        if isinstance(a, str) and len(a) > 1:
            node["name"] = a
        elif isinstance(a, list):
            for item in a:
                if len(item) > 1:
                    node["name"] = merge_value(node.get("name"), item)
        if smap.get("i"):
            node["description"] = smap["i"]
        if smap.get("n") and entity_type == "events":
            node["position"] = smap["n"]
        if node:
            data = merge_value(data, node)
    return collapse(data) if data else None


def build_subfield_if_4(record: dict, key: str, entity: str) -> Any:
    """551^4:orth / 551^orth — subfield node gated on $4 membership."""
    tag, _, gate = key.rpartition("^")
    gate = gate.split(":")[-1]
    data: Any = []
    for smap in occurrence_maps(record, tag[:3], "*"):
        if smap.get("4") and gate in smap["4"]:
            node = _single_subset_node(smap, tag[:3])
            if node:
                data = merge_value(data, node)
    return collapse(data) if data else None


def _single_subset_node(smap: dict, tag: str) -> dict | None:
    """Node from one already-gated occurrence (subset of
    build_subfield_node's per-occurrence logic)."""
    entity_type = _SUBFIELD_ENTITY.get(tag)
    node: dict[str, Any] = {}
    for item in _as_list(smap.get("0") or []):
        if not isinstance(item, str):
            continue
        if item.startswith(BASE_ID) and entity_type and entity_type != "resources":
            node["@id"] = f"{TARGET_ID}{entity_type}/{item[len(BASE_ID):]}"
        else:
            # unresolvable prefixes dropped (reference parity)
            uri = authority_uri(item)
            if uri:
                node["sameAs"] = merge_value(node.get("sameAs"), uri)
    a = smap.get("a")
    if isinstance(a, str) and len(a) > 1:
        node["name"] = a
    elif isinstance(a, list):
        for item in a:
            if len(item) > 1:
                node["name"] = merge_value(node.get("name"), item)
    if smap.get("i"):
        node["description"] = smap["i"]
    return node or None


# ---------------------------------------------------------------------------
# language (k10plus remap -> ISO label dim -> CategoryCode node)
# ---------------------------------------------------------------------------


_ISO_CODESET = "http://id.loc.gov/vocabulary/iso639-2"


def _language_node(code: str, en: str | None, de: str | None) -> dict:
    return {
        "@type": "CategoryCode",
        "@id": f"{_ISO_CODESET}/{code}",
        "codeValue": code,
        "name": {"en": en, "de": de},
        "inCodeSet": _ISO_CODESET,
    }


def build_language(record: dict, key: str, entity: str) -> Any:
    """041 language codes -> CategoryCode nodes: K10plus remap, ISO 639-2
    label dim, equality dedup; "und" fallback only for the $a selector
    (language.py:5-39 node shape exactly)."""
    out = []
    for code in _as_list(field_values(record, key, entity) or []):
        if not isinstance(code, str):
            continue
        iso = K10PLUS_TO_ISO.get(code, code)
        labels = LANGUAGE_LABELS.get(iso)
        if labels:
            node = _language_node(iso, labels[0], labels[1])
            if node not in out:
                out.append(node)
    if key.endswith("a") and not out:
        return _language_node("und", "Undetermined", "Nicht zu entscheiden")
    return out or None


# ---------------------------------------------------------------------------
# footnotes / collections / usage / physical / offers / editions
# ---------------------------------------------------------------------------


def build_footnotes(record: dict, keys: list, entity: str) -> list | None:
    out = []
    for tag in keys:
        for smap in occurrence_maps(record, tag, "*"):
            if not smap:
                continue
            node: dict[str, Any] = {}
            template = FOOTNOTE_TEMPLATES.get(tag)
            if template:
                node["@type"] = template["@type"]
                for code, value in smap.items():
                    if template.get(code):
                        node[template[code]] = value
                    if code == "0":
                        for _id in _as_list(value):
                            if isinstance(_id, str) and _id.startswith("(DE-627"):
                                node["@id"] = f"{TARGET_ID}topics/{_id[8:]}"
                        uris = [authority_uri(v) for v in _as_list(value)]
                        node["sameAs"] = collapse([u for u in uris if u] or None)
            if tag == "937":
                if any(c in smap for c in ("d", "e", "f")):
                    node["@type"] = "instrumentationNote"
                parts = []
                for code in ["a", "b", "c", "d", "e", "f"]:
                    parts.extend(_as_list(smap.get(code) or []))
                node["description"] = "; ".join(parts)
            if tag == "502":
                parts = []
                for code in ["a", "b", "c", "d"]:
                    parts.extend(_as_list(smap.get(code) or []))
                if parts:
                    node["description"] = ", ".join(parts)
            node = {k: v for k, v in node.items() if v is not None}
            if len(node) > 1:
                out.append(node)
    return out or None


def build_collection(record: dict, keys: list, entity: str) -> list | None:
    out = []
    for key in keys:
        for item in _as_list(field_values(record, key, "resources") or []):
            if key.startswith("084") and item in SSG_FID_LABELS:
                out.append({"preferredName": SSG_FID_LABELS[item], "abbr": item})
            if key.startswith("935") and item in COLLECTION_LABELS:
                out.append({"preferredName": COLLECTION_LABELS[item], "abbr": item})
    return out or None


_USAGE_TYPES = {"506": "accessState", "540": "licenceState"}


def build_usage_info(record: dict, keys: list, entity: str) -> list | None:
    out = []
    for key_ind in keys:
        tag, _, ind = key_ind.partition(".")
        for smap in occurrence_maps(record, tag, ind):
            node: dict[str, Any] = {"@type": _USAGE_TYPES[tag]}
            if smap.get("a"):
                node["name"] = smap["a"]
                node["alternateName"] = smap.get("f")
            elif smap.get("f"):
                node["name"] = smap["f"]
            node["sameAs"] = smap.get("u")
            out.append(node)
    return out or None


_PHYSICAL_MAP = {
    "extent": "300..a",
    "physical_details": "300..b",
    "dimensions": "300..c",
    "accompanying_material": "300..e",
    "reproduction_extent": "533..e",
}


def build_physical(record: dict, keys: Any, entity: str) -> dict | None:
    node = {
        prop: field_values(record, sel, entity) for prop, sel in _PHYSICAL_MAP.items()
    }
    node = {k: v for k, v in node.items() if v}
    return node or None


def build_offers(record: dict, keys: list, entity: str) -> list | None:
    """Availability offers when a 924$b branch is DE-14 (SLUB Dresden)."""
    ppn = field_values(record, keys[1], entity)
    branches = field_values(record, keys[0], entity)
    if not ppn or not branches:
        return None
    out = []
    for branch in _as_list(branches):
        if branch == "DE-14":
            out.append(
                {
                    "@type": "Offer",
                    "offeredBy": {
                        "@id": f"{TARGET_ID}organizations/191800287",
                        "@type": "Library",
                        "name": "Sächsische Landesbibliothek – Staats- und Universitätsbibliothek Dresden",
                        "branchCode": "DE-14",
                    },
                    "availability": f"https://katalog.slub-dresden.de/id/0-{ppn}",
                }
            )
    return out or None


def build_edition_statement(record: dict, key: Any, entity: str) -> str | None:
    a = field_values(record, "250..a", entity)
    b = field_values(record, "250..b", entity)
    if a and b:
        return f"{a}, {b}"


def build_edition_sequence(record: dict, key: str, entity: str) -> str | None:
    for smap in occurrence_maps(record, key, "0_"):
        if smap.get("a"):
            return collapse(_as_list(smap["a"]))


def build_repro_series(record: dict, key: str, entity: str) -> dict | None:
    value = field_values(record, key, entity)
    return {"name": value} if value else None


# ---------------------------------------------------------------------------
# about nodes (RVK / DDC / GND subjects, ≈ about.py:7-81)
# ---------------------------------------------------------------------------


def _ddc_about(code: str) -> dict:
    return {
        "identifier": {"@type": "PropertyValue", "propertyID": "DDC", "value": code},
        "@id": "http://purl.org/NET/decimalised#c" + code[:3],
    }


def _rvk_about(occurrence: dict) -> dict | None:
    """936/084 occurrence with the literal indicator "rv" -> RVK node."""
    if "rv" not in occurrence:
        return None
    smap: dict[str, Any] = {}
    for cell in occurrence["rv"]:
        for k, v in cell.items():
            smap[k] = merge_value(smap.get(k), v)
    node: dict[str, Any] = {}
    uris = [authority_uri(x) for x in _as_list(smap.get("0") or []) if isinstance(x, str)]
    uris = [u for u in uris if u]
    if smap.get("0"):
        node["sameAs"] = uris
    if smap.get("a"):
        node["@id"] = (
            "https://rvk.uni-regensburg.de/api/json/ancestors/"
            + str(smap["a"]).replace(" ", "%20")
        )
        node["identifier"] = {
            "@type": "PropertyValue",
            "propertyID": "RVK",
            "value": smap["a"],
        }
    if smap.get("b"):
        node["name"] = smap["b"]
    if smap.get("k"):
        node["keywords"] = smap["k"]
    return node


def build_about(record: dict, keys: list, entity: str) -> list | None:
    out = []
    for key in keys:
        if key in ("936", "084"):
            for occ in record.get(key) or []:
                if isinstance(occ, dict):
                    node = _rvk_about(occ)
                    if node is not None:
                        out.append(node)
        elif key in ("082", "083"):
            for code in _as_list(field_values(record, f"{key}..a") or []):
                if isinstance(code, str):
                    out.append(_ddc_about(code))
        elif key == "655":
            node = build_subfield_node(record, key, entity)
            if node is not None:
                out.append(node)
    return out or None


# ---------------------------------------------------------------------------
# identifiedBy: 12 identifier-scheme groups (≈ id.py:93-299), spec-driven
# ---------------------------------------------------------------------------


def _dedup_set(values: Any) -> list:
    vals = _as_list(values)
    seen = []
    for v in sorted(set(vals)) if all(isinstance(v, str) for v in vals) else vals:
        if v not in seen:
            seen.append(v)
    return seen


def build_identified_by(record: dict, keys: Any, entity: str) -> list | None:
    """Identifier nodes grouped by scheme: ISBN/ISSN/ISMN/UPC/EAN/
    Unspecified/Order/Report/NBN/VD16-18/Fingerprint/OCLC/BibRef/CODEN,
    each with validValues/invalidValues/relatedValues sets."""
    out: list[dict] = []

    def scheme(
        name: str,
        collect: list[tuple[str, str, str | list, str]],
        related: list[tuple[Any, Any, str]] | None = None,
        require: tuple[str, ...] = ("validValues", "relatedValues", "invalidValues"),
    ) -> None:
        node: dict[str, Any] = {"@type": name}
        for prop, tag, inds, code in collect:
            for smap in occurrence_maps(record, tag, inds):
                if smap.get(code):
                    node[prop] = merge_value(node.get(prop), smap[code])
        for tags, inds, code in related or []:
            for smap in occurrence_maps(record, tags, inds):
                if smap.get(code):
                    node["relatedValues"] = merge_value(
                        node.get("relatedValues"), smap[code]
                    )
        for prop in ("validValues", "relatedValues", "invalidValues", "label", "publisher"):
            if prop in node:
                node[prop] = _dedup_set(node[prop])
        if any(node.get(p) for p in require):
            out.append(node)

    scheme(
        "ISBN",
        [("validValues", "020", "*", "a"), ("invalidValues", "020", "*", "z")],
        related=[
            (["770", "772", "773", "775", "780", "785"], "*", "z"),
            ("776", ["08", "1_"], "z"),
            ("787", "00", "z"),
        ],
    )
    scheme(
        "ISSN",
        [("validValues", "022", "*", "a"), ("invalidValues", "022", "*", "y")],
        related=[
            (
                ["770", "772", "773", "775", "776", "780", "785", "787",
                 "800", "810", "811", "830"],
                "*",
                "x",
            )
        ],
    )
    scheme("ISMN", [("validValues", "022", "2_", "a"), ("invalidValues", "022", "2_", "z")])
    scheme("UPC", [("validValues", "022", "1_", "a")])
    scheme("EAN", [("validValues", "024", "3_", "a")])

    # per-occurrence node schemes
    for smap in occurrence_maps(record, "024", "8_"):
        node = {"@type": "Unspecified Number"}
        if smap.get("q"):
            node["label"] = _dedup_set(smap["q"])
        if smap.get("a"):
            node["validValues"] = _dedup_set(smap["a"])
        if node.get("validValues") and node not in out:
            out.append(node)
    for smap in occurrence_maps(record, "028", "*"):
        node = {"@type": "Order Number"}
        if smap.get("q"):
            node["label"] = _dedup_set(smap["q"])
        if smap.get("a"):
            node["validValues"] = _dedup_set(smap["a"])
        if smap.get("b"):
            node["publisher"] = _dedup_set(smap["b"])
        if node.get("validValues") and node not in out:
            out.append(node)
    for smap in occurrence_maps(record, "088", "*"):
        node = {"@type": "Report Number"}
        if smap.get("a"):
            node["validValues"] = _dedup_set(smap["a"])
        if node.get("validValues") and node not in out:
            out.append(node)
    # NBN: ONE node shared across occurrences — later matches overwrite its
    # validValues in place (id.py:228-236 appends the same dict object once)
    nbn: dict[str, Any] | None = None
    for smap in occurrence_maps(record, "015", "*"):
        if smap.get("2") == "dnb" and smap.get("a"):
            if nbn is None:
                nbn = {"@type": "NBN", "validValues": _as_list(smap["a"])}
                out.append(nbn)
            else:
                nbn["validValues"] = _as_list(smap["a"])
    for vd in ("16", "17", "18"):
        node: dict[str, Any] = {"@type": f"VD-{vd}", "validValues": None}
        for smap in occurrence_maps(record, "024", "7_"):
            if vd in ("17", "18") and smap.get("z") and smap.get("2") == f"vd{vd}":
                node["invalidValues"] = _as_list(smap["z"])
            if smap.get("2") == f"vd{vd}" and smap.get("a"):
                node["validValues"] = _as_list(smap["a"])
                if node not in out:
                    out.append(node)
    for smap in occurrence_maps(record, "026", "*"):
        if smap.get("e"):
            node = {"@type": "Fingerprint Hash", "validValues": _as_list(smap["e"])}
            if node not in out:
                out.append(node)

    # OCLC: appended even when empty (reference quirk, id.py:274-275 —
    # removeNone later strips the null leaving a bare {"@type": "OCLC"})
    oclc: dict[str, Any] = {"@type": "OCLC", "validValues": None}
    for smap in occurrence_maps(record, "035", "*"):
        a = smap.get("a")
        if isinstance(a, str) and a.startswith("(OCoLC)"):
            oclc["validValues"] = merge_value(oclc["validValues"], a.partition(")")[2])
    if isinstance(oclc["validValues"], str):
        oclc["validValues"] = [oclc["validValues"]]
    if oclc not in out:
        out.append(oclc)

    bibref: dict[str, Any] = {"@type": "Bibliografic References", "validValues": None}
    for smap in occurrence_maps(record, "510", "*"):
        if smap.get("a"):
            bibref["validValues"] = merge_value(bibref["validValues"], smap["a"])
    if isinstance(bibref["validValues"], str):
        bibref["validValues"] = [bibref["validValues"]]
    if bibref.get("validValues") and bibref not in out:
        out.append(bibref)

    coden: dict[str, Any] = {"@type": "CODEN", "validValues": None}
    for smap in occurrence_maps(record, "030", "*"):
        if smap.get("a"):
            coden["validValues"] = merge_value(coden["validValues"], smap["a"])
    if isinstance(coden["validValues"], str):
        coden["validValues"] = [coden["validValues"]]
    if coden.get("validValues") and coden not in out:
        out.append(coden)

    return out or None


# ---------------------------------------------------------------------------
# series / part-of relations (490/8xx/773)
# ---------------------------------------------------------------------------


def _linked_name(smap: dict) -> Any:
    """Shared 77x/8xx name rule: $a alone, "$t / $a" when both, $t alone."""
    a, t = smap.get("a"), smap.get("t")
    if a and not t:
        return a
    if a and t:
        return f"{t} / {a}"
    if t:
        return t
    return None


def _resource_id(smap: dict) -> str | None:
    for item in _as_list(smap.get("w") or []):
        if isinstance(item, str) and item.startswith("(DE-627"):
            return f"{TARGET_ID}resources/{item[8:]}"
    return None


def build_series_statement(record: dict, key: str, entity: str) -> list | None:
    """490 ind 0_: unlinked/uncounted series statements (relatedTo.py:9-20)."""
    out = []
    for smap in occurrence_maps(record, key, "0_"):
        node = {"name": smap.get("a"), "position": smap.get("v")}
        out.append(node)
    return out or None


def build_part_of_series(record: dict, keys: list, entity: str) -> list | None:
    """776(ind 1_ only)/8xx series membership (relatedTo.py:23-60)."""
    out = []
    for tag in keys:
        inds = "1_" if tag == "776" else "*"
        for smap in occurrence_maps(record, tag, inds):
            node: dict[str, Any] = {}
            rid = _resource_id(smap)
            if rid:
                node["@id"] = rid
            name = _linked_name(smap)
            if name:
                node["name"] = name
            if smap.get("v"):
                node["position"] = smap["v"]
            elif smap.get("9"):
                node["position"] = smap["9"]
            if node:
                out.append(node)
    return out or None


def build_is_part_of(record: dict, keys: list, entity: str) -> list | None:
    """773 ind 08/18 host-item links; 18 pulls the record's own title
    (relatedTo.py:63-101). Only linked nodes (with @id) are kept."""
    out = []
    for indicator in ("08", "18"):
        for smap in occurrence_maps(record, "773", indicator):
            node: dict[str, Any] = {}
            rid = _resource_id(smap)
            if rid:
                node["@id"] = rid
            if smap.get("g"):
                node["position"] = ", ".join(_as_list(smap["g"]))
            if indicator == "08":
                name = _linked_name(smap)
                if name:
                    node["name"] = name
                if smap.get("d"):
                    node["publisherNote"] = ", ".join(_as_list(smap["d"]))
                node["displayLabel"] = smap.get("i")
            else:
                title = build_title(record, None, entity) or {}
                node["mainTitle"] = title.get("mainTitle")
                part = title.get("partStatement")
                if isinstance(part, list) and part:
                    node["partStatement"] = part[0]
                node["name"] = "{}. {}".format(
                    title.get("mainTitle"), node.get("partStatement")
                )
            if node.get("@id"):
                out.append(node)
    return out or None


def build_relations(record: dict, keys: list, entity: str) -> list | None:
    """77x/78x linking entries, indicator prefix 0* (relatedTo.py:104-127):
    name via the $a/$t rule, relationType from $i, @id from (DE-627)$w."""
    out = []
    for smap in occurrence_maps(record, keys, "0*"):
        node: dict[str, Any] = {}
        rid = _resource_id(smap)
        if rid:
            node["@id"] = rid
        name = _linked_name(smap)
        if name:
            node["name"] = name
        if smap.get("i"):
            node["relationType"] = smap["i"]
        if node:
            out.append(node)
    return out or None


# ---------------------------------------------------------------------------
# person-to-person relations with dynamic predicate (relatedTo)
# ---------------------------------------------------------------------------


def relation_predicate(phrase: Any) -> str:
    """$9 code/text -> predicate via exact then substring matching; fallback
    "relatedTo" (≈ relatedTo.py:156-192 lookup semantics)."""
    for p in _as_list(phrase or []):
        if not isinstance(p, str):
            continue
        if p in RELATION_PHRASES:
            return RELATION_PHRASES[p]
        for key, pred in RELATION_PHRASES.items():
            if key.lower() in p.lower():
                return pred
    return "relatedTo"


def _route_relation_ids(node: dict, ids: Any, entity_type: str) -> None:
    """$0 routing for relation nodes: base-prefixed -> minted @id, resolvable
    authority -> sameAs, else identifier."""
    for item in _as_list(ids or []):
        if not isinstance(item, str):
            continue
        if item.startswith(BASE_ID):
            node["@id"] = f"{TARGET_ID}{entity_type}/{item[len(BASE_ID):]}"
        else:
            uri = authority_uri(item)
            if uri:
                node["sameAs"] = merge_value(node.get("sameAs"), uri)
            else:
                node["identifier"] = merge_value(node.get("identifier"), item)


def build_related(record: dict, key: str, entity: str) -> list | None:
    """Relation nodes with a dynamic ``_key`` predicate (the engine fans the
    node out into the property named by _key, ≈ processing.py:40-49 +
    relatedTo.py:130-199).

    Reference contract: occurrences *without* $9 produce nothing; a scalar
    $9 must match the phrase table exactly; a list $9 matches by substring
    with "relatedTo" fallback. $t flips the node to a works-typed relation
    with name/author split.
    """
    tag = key[:3]
    out = []
    for smap in occurrence_maps(record, tag, "*"):
        node: dict[str, Any] = {}
        entity_type = "persons"
        a, t = smap.get("a"), smap.get("t")
        if a and not t:
            node["name"] = a
        elif a and t:
            node["name"] = t
            node["author"] = a
            entity_type = "works"
        elif t:
            node["name"] = t
            entity_type = "works"
        nine = smap.get("9")
        if isinstance(nine, str) and nine in RELATION_PHRASES:
            node["_key"] = RELATION_PHRASES[nine]
        elif isinstance(nine, list):
            node["_key"] = relation_predicate(nine)
        else:
            continue  # no usable $9 -> reference emits nothing
        _route_relation_ids(node, smap.get("0"), entity_type)
        out.append(node)
    return out or None
