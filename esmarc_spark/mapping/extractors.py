"""Node-building extractors: MARC field occurrences -> JSON-LD nodes.

Each function has the uniform signature ``f(record, key, entity) -> node(s)``
so the declarative mapping spec (esmarc_spark.mapping.spec) can reference it
by name, exactly like the reference's ``entities`` table references its
extractor functions.

Semantics parity (documented, not copied):
  * mentions       ≈ /root/reference/esmarc/classifications.py:54-152
  * classifications≈ /root/reference/esmarc/classifications.py:7-51
  * publisher      ≈ /root/reference/esmarc/publisher.py:4-40
  * publish places ≈ /root/reference/esmarc/publisher.py:43-61
  * cartographic   ≈ /root/reference/esmarc/coordinates.py:29-45
  * geo coords     ≈ /root/reference/esmarc/coordinates.py:4-26
  * sameAs         ≈ /root/reference/esmarc/sameAs.py:7-32
  * authority URIs ≈ /root/reference/esmarc/id.py:7-59
  * identifiers    ≈ /root/reference/esmarc/id.py:75-90
  * gender/pages/genre ≈ /root/reference/esmarc/{gender,nop,genre}.py

All of these execute inside Arrow batches on executors (mapInPandas); they
never run row-at-a-time across the JVM boundary.
"""

from __future__ import annotations

import copy
import re
from typing import Any

from esmarc_spark.lookups.dims import (
    AUTHORITY_PREFIXES,
    BASE_ID,
    CLASSIFICATION_SCHEMES,
    ENTITY_DISPATCH,
    IDENTIFIER_SCHEMES,
    MENTION_FIELD_TYPES,
    MENTION_TYPE_CODES,
    PLACE_TYPES,
    TARGET_ID,
)
from esmarc_spark.marc.records import (
    collapse,
    field_values,
    merge_value,
    occurrence_maps,
)

# ---------------------------------------------------------------------------
# id / URI minting
# ---------------------------------------------------------------------------


def _as_list(v: Any) -> list:
    return v if isinstance(v, list) else [v]


def authority_uri(prefixed_id: str) -> str | None:
    """Resolve ``(DE-588)123`` -> ``https://d-nb.info/gnd/123`` (id part
    uppercased); DE-576 deliberately unresolvable; unknown prefix -> None."""
    if not isinstance(prefixed_id, str) or "(DE-" not in prefixed_id:
        return None
    prefix, _, num = prefixed_id.partition(")")
    prefix += ")"
    if prefix == "(DE-576)" or prefix not in AUTHORITY_PREFIXES:
        return None
    return AUTHORITY_PREFIXES[prefix]["@id"] + num.upper()


def mint_id(record_id: str, entity: str) -> str:
    """``@id`` = TARGET_ID + entity + "/" + record id (base prefix stripped)."""
    if record_id.startswith(BASE_ID):
        record_id = record_id[len(BASE_ID):]
    return f"{TARGET_ID}{entity}/{record_id}"


def record_id_of(record: dict) -> str | None:
    rid = field_values(record, "001")
    return rid if isinstance(rid, str) else collapse(rid)


def build_id(record: dict, key: str, entity: str) -> str | None:
    rid = field_values(record, key)
    if rid:
        return mint_id(rid if isinstance(rid, str) else str(rid), entity)


def build_isil(record: dict, key: str | list, entity: str) -> str | None:
    """First 003/852$a/924$b value that is a known authority ISIL
    (≈ id.py:62-72: membership test against the sameAs prefix dim)."""
    value = field_values(record, key, entity)
    for item in _as_list(value) if value else []:
        if isinstance(item, str) and f"({item})" in AUTHORITY_PREFIXES:
            return item
    return None


# ---------------------------------------------------------------------------
# sameAs (cross-authority links — the reference's entity-linking edges)
# ---------------------------------------------------------------------------


def build_same_as(record: dict, keys: list, entity: str) -> list:
    ids: Any = []
    for key in keys:
        if key == "016":
            for smap in occurrence_maps(record, key, "*"):
                if smap.get("a") and smap.get("2"):
                    ids = merge_value(ids, f"({smap['2']}){smap['a']}")
        elif key == "035..a":
            ids = merge_value(ids, field_values(record, key, entity))
    nodes = []
    for prefixed in _as_list(ids) if ids else []:
        if not isinstance(prefixed, str) or prefixed[:8] not in AUTHORITY_PREFIXES:
            continue
        uri = authority_uri(prefixed)
        node = dict(AUTHORITY_PREFIXES[prefixed[:8]])
        node["@id"] = uri
        node["isBasedOn"] = {"@type": "Dataset", "@id": ""}
        nodes.append(node)
    return nodes


# ---------------------------------------------------------------------------
# mentions (typed entities referenced by a resource — 6xx fields)
# ---------------------------------------------------------------------------

_MENTION_TAGS = ["600", "610", "611", "630", "648", "650", "651", "653", "655", "689"]


def build_mentions(record: dict, keys: list | None = None, entity: str = "resources") -> list | None:
    keys = keys or _MENTION_TAGS
    out: list[dict] = []
    for tag in keys:
        for smap in occurrence_maps(record, tag, "*"):
            node: dict[str, Any] = {}
            dcode = smap.get("D")
            if tag == "689":
                if smap.get("5"):
                    continue
                if smap.get("A") == "z":
                    node["@type"] = "ChronologicalSubject"
                elif dcode:
                    node["@type"] = MENTION_TYPE_CODES.get(dcode)
                    for item in _as_list(smap.get("0") or []):
                        if item.startswith("(DE-627") and dcode in ENTITY_DISPATCH:
                            local = item.partition(")")[2]
                            node["@id"] = f"{TARGET_ID}{ENTITY_DISPATCH[dcode]}/{local}"
                        if item.startswith("(DE-588"):
                            node["sameAs"] = (
                                "https://d-nb.info/gnd/" + item.partition(")")[2]
                            )
            if tag in MENTION_FIELD_TYPES:
                template = MENTION_FIELD_TYPES[tag]
                node["@type"] = template["@type"]
                is_corp_event = tag in ("610", "611") and (
                    smap.get("c") or smap.get("d")
                )
                if is_corp_event:
                    node["@type"] = "Event"
                for item in _as_list(smap.get("0") or []):
                    if item.startswith("(DE-627"):
                        local = item.partition(")")[2]
                        if is_corp_event:
                            node["@id"] = f"{TARGET_ID}events/{local}"
                        elif template.get("@id"):
                            node["@id"] = f"{TARGET_ID}{template['@id']}/{local}"
                    if item.startswith("(DE-588"):
                        node["sameAs"] = (
                            "https://d-nb.info/gnd/" + item.partition(")")[2]
                        )
            name = smap.get("a")
            if name:
                if tag.startswith("65") and isinstance(name, list):
                    # multi-$a subject fields fan out into one node per value,
                    # skipping all further decoration (reference behavior)
                    for item in name:
                        fanned = copy.deepcopy(node)
                        fanned["preferredName"] = item
                        fanned["name"] = item
                        if fanned not in out:
                            out.append(fanned)
                    continue
                node["preferredName"] = name
                node["name"] = name
            if tag == "600":
                if smap.get("b"):
                    node["preferredName"] += " {}".format(smap["b"])
                    node["name"] += " {}".format(smap["b"])
                if smap.get("c"):
                    node["preferredName"] += ", {}".format(smap["c"])
                    node["name"] += ", {}".format(smap["c"])
                if smap.get("d"):
                    node["preferredName"] += " ({})".format(smap["d"])
            if node.get("@type") == "Organisation":
                if smap.get("b"):
                    node["preferredName"] += ", {}".format(smap["b"])
                    node["name"] += ", {}".format(smap["b"])
                if smap.get("g"):
                    node["preferredName"] += ", {}".format(smap["g"])
                if smap.get("e"):
                    node["name"] += ", {}".format(smap["e"])
            if node.get("@type") == "Event":
                for code in ("n", "d", "c", "e", "g"):
                    if smap.get(code):
                        node["preferredName"] += ", {}".format(smap[code])
            if tag == "630" or (tag == "689" and dcode in ("g", "u")):
                if smap.get("p"):
                    node["preferredName"] += " / {}".format(smap["p"])
                    node["name"] += " / {}".format(smap["p"])
                if smap.get("n"):
                    node["preferredName"] += " <{}>".format(smap["n"])
            if (
                tag in ("630", "650") or (tag == "689" and dcode in ("g", "u", "s"))
            ) and smap.get("g"):
                node["name"] += " <{}>".format(smap["g"])
                node["preferredName"] += " <{}>".format(smap["g"])
            if smap.get("n") and (
                tag in ("610", "611", "630")
                or (tag == "689" and dcode in ("b", "u", "f"))
            ):
                node["position"] = [
                    item[1:] if item.startswith("(") else item
                    for item in _as_list(smap["n"])
                ]
            if smap.get("d") and (
                tag in ("600", "610", "611")
                or (tag == "689" and dcode in ("f", "n", "p"))
            ):
                d = smap["d"]
                node["date"] = d[1:] if d.startswith("(") else d
            if smap.get("g") and (
                tag in ("610", "611", "630", "650")
                or (tag == "689" and dcode in ("b", "f", "s", "u"))
            ):
                node["additionalInformation"] = smap["g"]
            if node not in out:
                out.append(node)
    return out or None


# ---------------------------------------------------------------------------
# classifications (CategoryCodeSet stencils keyed by field.indicator or $2)
# ---------------------------------------------------------------------------


def build_classifications(record: dict, keys: list, entity: str) -> list | None:
    out: list[dict] = []
    for key_ind in keys:
        tag, _, ind = key_ind.partition(".")
        for smap in occurrence_maps(record, tag, ind):
            if not smap.get("a"):
                continue
            for code_value in _as_list(smap["a"]):
                scheme_key = (
                    key_ind if key_ind in CLASSIFICATION_SCHEMES else smap.get("2")
                )
                if scheme_key not in CLASSIFICATION_SCHEMES:
                    continue
                entry = copy.deepcopy(CLASSIFICATION_SCHEMES[scheme_key])
                code = entry["CategoryCodes"][0]
                code["codeValue"] = code_value
                if code.get("@id"):
                    code["@id"] += code_value
                existing = next(
                    (e for e in out if e["name"] == entry["name"]), None
                )
                if existing is None:
                    out.append(entry)
                elif code not in existing["CategoryCodes"]:
                    existing["CategoryCodes"].append(code)
    return out or None


# ---------------------------------------------------------------------------
# publisher / originalPublisher / publication places
# ---------------------------------------------------------------------------


def build_publisher(record: dict, keys: list, entity: str) -> dict | None:
    node: dict[str, Any] = {}
    for smap in occurrence_maps(record, "533", "*"):
        node["@type"] = "Organization"
        node["name"] = smap.get("c")
        node["location"] = {"@type": "Place", "name": smap.get("b")}
    if not node.get("name"):
        for smap in occurrence_maps(record, "264", "*"):
            node["@type"] = "Organization"
            node["name"] = smap.get("b")
            node["location"] = {"@type": "Place"}
            if smap.get("a"):
                node["location"]["name"] = ", ".join(_as_list(smap["a"]))
    return node if node.get("name") else None


def build_original_publisher(record: dict, keys: list, entity: str) -> dict | None:
    node: dict[str, Any] = {}
    if record.get("533") and record.get("264"):
        for smap in occurrence_maps(record, "264", "*"):
            node["@type"] = "Organization"
            node["name"] = smap.get("b")
            node["location"] = {"@type": "Place"}
            if smap.get("a"):
                node["location"]["name"] = ", ".join(_as_list(smap["a"]))
    return node if node.get("name") else None


def build_publish_locations(record: dict, key: str, entity: str) -> list | None:
    out = []
    for smap in occurrence_maps(record, key, "*"):
        node: dict[str, Any] = {}
        if smap.get("4"):
            node["@type"] = PLACE_TYPES.get(smap["4"])
        node["preferredName"] = smap.get("a")
        for item in _as_list(smap.get("0") or []):
            if item.startswith("(DE-627"):
                node["@id"] = f"{TARGET_ID}geo/{item.partition(')')[2]}"
        if node.get("preferredName"):
            out.append(node)
    return out or None


# ---------------------------------------------------------------------------
# cartographic / geo
# ---------------------------------------------------------------------------


def build_cartographic_data(record: dict, key: str, entity: str) -> dict | None:
    node = {}
    for prop, code in (("scale", "a"), ("projection", "b"), ("coordinates", "c")):
        value = field_values(record, f"255..{code}", entity)
        if value:
            node[prop] = value
    return node or None


def _first_decimal(value: Any) -> str | None:
    for item in _as_list(value) if value is not None else []:
        if isinstance(item, str) and "." in item:
            return item
    return None


def build_geo_coordinates(record: dict, key: dict, entity: str) -> dict | None:
    node: dict[str, Any] = {}
    for prop, selectors in key.items():
        raw = _first_decimal(field_values(record, selectors, entity))
        if raw:
            node["@type"] = "GeoCoordinates"
            node[prop] = (
                raw.replace("N", "").replace("S", "-").replace("E", "").replace("W", "-")
            )
    return node or None


# ---------------------------------------------------------------------------
# misc scalar extractors
# ---------------------------------------------------------------------------


def build_identifiers(record: dict, key: str, entity: str) -> list | None:
    out = []
    for smap in occurrence_maps(record, key, "*"):
        scheme, value = smap.get("2"), smap.get("a")
        if scheme in IDENTIFIER_SCHEMES and value:
            out.append(
                {
                    "@id": f"{IDENTIFIER_SCHEMES[scheme]}{value}",
                    "@type": "PropertyValue",
                    "propertyID": scheme,
                    "value": value,
                }
            )
    return out or None


_SEX_LABELS = {"0": "Unknown", "1": "Male", "2": "Female"}


def build_gender(record: dict, key: str, entity: str) -> str | None:
    code = field_values(record, key, entity)
    if isinstance(code, str):
        return _SEX_LABELS.get(code)


def build_page_count(record: dict, key: str, entity: str) -> int | None:
    """"123 S." -> 123. Reference contract (nop.py:5-24): every collected
    300-value is visited in order and OVERWRITES the result — a trailing
    non-page value (e.g. "24 cm") nulls an earlier match."""
    raw = field_values(record, key, entity)
    result = None
    for item in _as_list(raw) if raw else []:
        if not isinstance(item, str):
            break
        prefix = item.split("S.")[0].strip() if "S." in item else None
        if prefix is not None and prefix.lstrip("-").isdigit():
            result = int(prefix)
        else:
            result = None
    return result


def build_genre(record: dict, key: str, entity: str) -> dict | None:
    value = field_values(record, key, entity)
    if value:
        return {"@type": "Text", "Text": value}


def build_access_mode(record: dict, key: str, entity: str) -> str | None:
    raw = field_values(record, key, entity)
    code = raw[0] if isinstance(raw, list) and raw else raw
    if isinstance(code, str):
        return "online" if code[:2] in ("cr", "cz") else "local"


def build_alternate_names(record: dict, key: str | list, entity: str) -> Any:
    """Name values with trailing ``" /"`` stripped (statement-of-responsibility)."""
    value = field_values(record, key, entity)
    if isinstance(value, str):
        return value[:-2] if value.endswith(" /") else value
    if isinstance(value, list):
        return [v[:-2] if isinstance(v, str) and v.endswith(" /") else v for v in value]
    return value


def build_name(record: dict, key: str | list, entity: str) -> str | None:
    """Single name: alternate-name cleanup, multi-values joined with " "
    (namings.py:8-15 contract)."""
    value = build_alternate_names(record, key, entity)
    if isinstance(value, list):
        value = " ".join(value)
    return value or None


def build_date_modified(record: dict, key: str, entity: str) -> str | None:
    """``20220427113326.0`` -> ``2022-04-27T11:33:26Z``; bad 2-char groups -> 00."""
    raw = field_values(record, key, entity)
    if not isinstance(raw, str) or len(raw) < 14:
        return None
    pairs = [raw[0:4]] + [raw[i : i + 2] for i in range(4, 14, 2)]
    if not pairs[0].isdigit():
        return None
    norm = [pairs[0]] + [p if p.isdigit() else "00" for p in pairs[1:]]
    return f"{norm[0]}-{norm[1]}-{norm[2]}T{norm[3]}:{norm[4]}:{norm[5]}Z"
