"""Tag-value filter registry — Column builders.

Reproduces the reference filter vocabulary
(reference src/query/filter/TagVFilter.java:56-70 registry;
TagVLiteralOrFilter.java:32-165, TagVWildcardFilter.java:31,
TagVRegexFilter.java:26-104, TagVNotKeyFilter.java:8-68,
TagVNotLiteralOrFilter.java:29-184) as native Spark Column predicates, so
they push down / fold inside Catalyst instead of running as post-scan Java
callbacks like the reference does.

A filter is a callable (tags_col, tagk, filter_str) -> Column(boolean).
New filter types register via :func:`register_filter` — the Spark analog of
the reference's plugin loading (TagVFilter.java:355-380).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

FilterBuilder = Callable[[Column, str, str], Column]

FILTERS: dict[str, FilterBuilder] = {}


def register_filter(name: str) -> Callable[[FilterBuilder], FilterBuilder]:
    def deco(fn: FilterBuilder) -> FilterBuilder:
        FILTERS[name] = fn
        return fn

    return deco


def _tagv(tags: Column, tagk: str) -> Column:
    return tags.getItem(tagk)


# reference tsd.query.filter.expansion_limit (src/utils/Config.java:595):
# caps how many literals one filter may expand to. There it protects the
# HBase scanner regex; here a multi-thousand-value isin() is an equally bad
# plan (a broadcast semi-join is the right tool at that size) — fail fast.
EXPANSION_LIMIT = 4096


def _split_literals(filter_str: str) -> list[str]:
    # pipe-separated literal list (reference TagVLiteralOrFilter.java:43-60)
    lits = [s for s in filter_str.split("|") if s != ""]
    if len(lits) > EXPANSION_LIMIT:
        raise ValueError(
            f"filter expands to {len(lits)} literals, over the expansion limit "
            f"of {EXPANSION_LIMIT}; join against a literal DataFrame instead"
        )
    return lits


@register_filter("literal_or")
def literal_or(tags: Column, tagk: str, filter_str: str) -> Column:
    return _tagv(tags, tagk).isin(_split_literals(filter_str))


@register_filter("iliteral_or")
def iliteral_or(tags: Column, tagk: str, filter_str: str) -> Column:
    lits = [s.lower() for s in _split_literals(filter_str)]
    return F.lower(_tagv(tags, tagk)).isin(lits)


@register_filter("not_literal_or")
def not_literal_or(tags: Column, tagk: str, filter_str: str) -> Column:
    # series must HAVE the tag and its value not be in the list
    # (reference TagVNotLiteralOrFilter.java:29-60)
    v = _tagv(tags, tagk)
    return v.isNotNull() & ~v.isin(_split_literals(filter_str))


@register_filter("not_iliteral_or")
def not_iliteral_or(tags: Column, tagk: str, filter_str: str) -> Column:
    v = _tagv(tags, tagk)
    lits = [s.lower() for s in _split_literals(filter_str)]
    return v.isNotNull() & ~F.lower(v).isin(lits)


def _glob_to_like(pattern: str) -> str:
    # '*' is the only wildcard char (reference TagVWildcardFilter.java:55-70);
    # escape SQL LIKE specials, then map * -> %
    esc = pattern.replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
    return esc.replace("*", "%")


@register_filter("wildcard")
def wildcard(tags: Column, tagk: str, filter_str: str) -> Column:
    return _tagv(tags, tagk).like(_glob_to_like(filter_str))


@register_filter("iwildcard")
def iwildcard(tags: Column, tagk: str, filter_str: str) -> Column:
    return F.lower(_tagv(tags, tagk)).like(_glob_to_like(filter_str.lower()))


@register_filter("regexp")
def regexp(tags: Column, tagk: str, filter_str: str) -> Column:
    return _tagv(tags, tagk).rlike(filter_str)


@register_filter("not_key")
def not_key(tags: Column, tagk: str, filter_str: str) -> Column:
    # series must NOT contain the tag key at all (TagVNotKeyFilter.java:8-68)
    return ~F.map_contains_key(tags, tagk)


def build_tag_filter(tags: Column, ftype: str, tagk: str, filter_str: str) -> Column:
    """Look up + build one filter predicate Column."""
    try:
        builder = FILTERS[ftype]
    except KeyError:
        raise ValueError(f"unknown tag filter type: {ftype!r} (have {sorted(FILTERS)})") from None
    return builder(tags, tagk, filter_str)


# /api/config/filters metadata: the reference collects each filter class's
# static description()/examples() strings (TagVFilter.java:359-380,
# RpcManager.java:802-808 ShowConfig). Keyed by registry name so plugin
# filters registered at runtime appear too (with placeholder text).
FILTER_METADATA: dict[str, dict[str, str]] = {
    "literal_or": {
        "description": "Accepts one or more exact values and matches if the "
                       "series contains any of them. Case sensitive.",
        "examples": "host=literal_or(web01),  host=literal_or(web01|web02)",
    },
    "iliteral_or": {
        "description": "Accepts one or more exact values and matches if the "
                       "series contains any of them. Case insensitive.",
        "examples": "host=iliteral_or(web01),  host=iliteral_or(WEB01|Web02)",
    },
    "not_literal_or": {
        "description": "Skips any series with one or more of the given "
                       "exact values. Case sensitive.",
        "examples": "host=not_literal_or(web01|web02)",
    },
    "not_iliteral_or": {
        "description": "Skips any series with one or more of the given "
                       "exact values. Case insensitive.",
        "examples": "host=not_iliteral_or(web01|WEB02)",
    },
    "wildcard": {
        "description": "Performs pre/post/in-fix glob matching of values. "
                       "The globs are case sensitive.",
        "examples": "host=wildcard(web*),  host=wildcard(*.tsdb.net)",
    },
    "iwildcard": {
        "description": "Performs pre/post/in-fix glob matching of values. "
                       "The globs are case insensitive.",
        "examples": "host=iwildcard(WEB*)",
    },
    "regexp": {
        "description": "Provides full, POSIX-compliant regular expression "
                       "matching of tag values.",
        "examples": "host=regexp(.*)",
    },
    "not_key": {
        "description": "Skips any series with the given tag key, regardless "
                       "of the value.",
        "examples": "host=not_key()",
    },
}


def loaded_filters() -> dict[str, dict[str, str]]:
    """{filter name: {description, examples}} for every registered filter
    (reference TagVFilter.loadedFilters)."""
    out = {}
    for name in sorted(FILTERS):
        out[name] = FILTER_METADATA.get(
            name,
            {"description": "plugin filter", "examples": f"tagk={name}(...)"},
        )
    return out
