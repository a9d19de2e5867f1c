"""Boilerplate removal — block-level main-content extraction for web
pages (the Kohlschütter-style link-density heuristic, reduced to pure
Catalyst expressions).

S1 (`pipeline/extract_text.py`) flattens the WHOLE page byte-identically
— navigation, footers and all — which is the right contract for mention
offsets. A training-data pipeline usually wants the main content only;
this operator provides that as a separate, composable column:

1. script/style/head subtrees dropped;
2. the page is split into blocks at block-level tags
   (p/div/li/td/h1-6/article/...);
3. per block: visible text (tags stripped, entities decoded, whitespace
   collapsed), its length, and its LINK length (visible text inside
   <a> elements);
4. blocks shorter than ``min_chars`` or with link density above
   ``max_link_density`` are dropped (navigation/footer blocks are short
   and link-dense — the classic separator);
5. survivors join with a newline.

Every step is a whole-stage-codegen expression (split / transform /
filter / aggregate over the block array — no explode, no shuffle, no
Python), and every regex avoids backreferences and lookarounds so the
DuckDB (RE2) oracle runs the IDENTICAL patterns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# alternation, not a backreference (</\1>), so RE2 engines run it too
_DROP_SUBTREES = (
    r"(?is)<script\b.*?</script>|<style\b.*?</style>|<head\b.*?</head>"
)
_BLOCK_SPLIT = (
    r"(?i)</?(?:p|div|td|th|li|ul|ol|h[1-6]|article|section|header|footer"
    r"|nav|aside|table|tr|blockquote|br)(?:\s[^>]*)?/?>"
)
_ANCHOR = r"(?is)<a\s[^>]*>.*?</a>|<a>.*?</a>"
_TAG = r"(?s)<[^>]*>"

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}


# Unicode-whitespace collapse as an explicit class instead of (?U)\s:
# Java's (?U)\s and RE2's \s disagree on non-ASCII whitespace (RE2 \s is
# ASCII-only), so the cross-engine parity claim held only for ASCII
# pages. [\s\p{Z}\x0b\x85] evaluates to the SAME set — the Unicode
# White_Space property — in both engines: Java \s {09-0D,20} ∪ Z ∪
# {0B,85} == RE2 \s {09,0A,0C,0D,20} ∪ Z ∪ {0B,85}.
_WS_CLASS = r"[\s\p{Z}\x0b\x85]+"


def _visible(col: F.Column) -> F.Column:
    """Tag-strip + entity decode + whitespace collapse (S1 semantics)."""
    s = F.regexp_replace(col, _TAG, " ")
    for ent, ch in _ENTITIES.items():
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, _WS_CLASS, " "))


def extract_main_text(
    html: F.Column, min_chars: int = 25, max_link_density: float = 0.4
) -> F.Column:
    """Main-content text from an html STRING column (decode binary html
    with ``make_valid_utf8(cast(... as string))`` first)."""
    pre = F.regexp_replace(html, _DROP_SUBTREES, " ")
    blocks = F.split(pre, _BLOCK_SPLIT)

    def stats(b: F.Column) -> F.Column:
        text = _visible(b)
        anchors = F.regexp_extract_all(b, F.lit(_ANCHOR), 0)
        link_len = F.aggregate(
            F.transform(anchors, lambda a: F.length(_visible(a))),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        return F.struct(text.alias("text"), link_len.alias("link_len"))

    kept = F.filter(
        F.transform(blocks, stats),
        lambda s: (F.length(s.text) >= min_chars)
        & (s.link_len <= F.length(s.text) * max_link_density),
    )
    return F.array_join(F.transform(kept, lambda s: s.text), "\n")


def main_text_sql(
    html_expr: str, min_chars: int = 25, max_link_density: float = 0.4
) -> str:
    """The identical heuristic in DuckDB SQL (same regexes — RE2-safe by
    construction), parameterized by the html-producing expression."""
    ent = "replace(replace(replace(replace(replace(replace(replace({x}, '&amp;', '&'), '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), '&apos;', ''''), '&nbsp;', ' ')"

    def visible(x: str) -> str:
        stripped = f"regexp_replace({x}, '(?s)<[^>]*>', ' ', 'g')"
        return (
            "trim(regexp_replace("
            + ent.format(x=stripped)
            + ", '[\\s\\p{Z}\\x0b\\x85]+', ' ', 'g'))"
        )

    return f"""
        list_aggregate(list_transform(list_filter(list_transform(
            regexp_split_to_array(
              regexp_replace({html_expr},
                '(?is)<script\\b.*?</script>|<style\\b.*?</style>|<head\\b.*?</head>',
                ' ', 'g'),
              '(?i)</?(?:p|div|td|th|li|ul|ol|h[1-6]|article|section|header|footer|nav|aside|table|tr|blockquote|br)(?:\\s[^>]*)?/?>'),
            b -> struct_pack(
              txt := {visible('b')},
              link_len := coalesce(list_aggregate(list_transform(
                regexp_extract_all(b, '(?is)<a\\s[^>]*>.*?</a>|<a>.*?</a>', 0),
                a -> length({visible('a')})), 'sum'), 0))),
          s -> length(s.txt) >= {min_chars}
               AND s.link_len <= length(s.txt) * {max_link_density}),
        s -> s.txt), 'string_agg', chr(10))
    """
