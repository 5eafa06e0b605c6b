"""Columnar scalar functions for wiki tag parsing/validation.

Each mirrors a reference predicate exactly (citations inline); all are
native Column expressions — JVM-side, whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from wikibrain_spark.functions.languages import (
    LANGUAGE_CODE_REDIRECTS,
    LANGUAGE_CODES_BY_IMPORTANCE,
)

QID_REGEX = "^Q[0-9]+$"  # wikimedia_link_issue_reporter.py:1172-1181


def lang_code_of(link: Column) -> Column:
    """get_language_code_from_link: text before the first colon, else NULL."""
    return F.when(link.contains(":"), F.substring_index(link, ":", 1))


def article_name_of(link: Column) -> Column:
    """get_article_name_from_link: text after the first colon, else NULL."""
    return F.when(link.contains(":"), link.substr(F.instr(link, ":") + 1, F.length(link)))


def strip_section(article: Column) -> Column:
    """([^#]*)#... -> group 1 (wikimedia_link_issue_reporter.py:1041-1043)."""
    return F.when(article.contains("#"), F.regexp_extract(article, "([^#]*)#", 1)).otherwise(article)


def is_qid_part_broken(part: Column) -> Column:
    """is_wikidata_tag_clearly_broken_or_with_multiple_values (:1172-1181)."""
    return part.isNull() | (F.length(part) < 2) | ~part.rlike(QID_REGEX)


def is_wikidata_value_broken(value: Column) -> Column:
    """is_wikidata_tag_clearly_broken (:1160-1170): empty is broken; one
    trailing ';' tolerated only for multi-value; each ';'-part must be ^Q\\d+$."""
    # strip single trailing ';' iff more than one ';' present (:1163-1164)
    stripped = F.when(
        value.endswith(";") & (F.size(F.split(value, ";", -1)) > 2),
        F.regexp_replace(value, ";$", ""),
    ).otherwise(value)
    return (value == "") | F.exists(F.split(stripped, ";", -1), is_qid_part_broken)


def is_language_code_broken(lang: Column) -> Column:
    """is_language_code_clearly_broken (:1195-1209): NULL broken; known code
    or redirect fine; else broken if >3 chars or not ^[a-z]+$."""
    known = F.lit(LANGUAGE_CODES_BY_IMPORTANCE)
    redirects = F.lit(LANGUAGE_CODE_REDIRECTS)
    return F.when(lang.isNull(), F.lit(True)).otherwise(
        ~F.array_contains(known, lang)
        & ~F.array_contains(redirects, lang)
        & ((F.length(lang) > 3) | ~lang.rlike("^[a-z]+$"))
    )


def is_article_name_broken(article: Column) -> Column:
    """is_article_name_clearly_broken (:1183-1193): '?' in name, or the name
    itself starts with a known language code + ':' (double prefix)."""
    inner_lang = lang_code_of(article)
    return F.when(article.isNull(), F.lit(True)).otherwise(
        article.contains("?")
        | (inner_lang.isNotNull() & F.array_contains(F.lit(LANGUAGE_CODES_BY_IMPORTANCE), inner_lang))
    )


def is_wikipedia_value_broken(value: Column) -> Column:
    """is_wikipedia_tag_clearly_broken (:1149-1158)."""
    return is_language_code_broken(lang_code_of(value)) | is_article_name_broken(article_name_of(value))


_EXEMPT_KEYS = [
    # is_an_actual_wikidata_or_wikipedia_key (:641-670) — exact entries
    "fixme:wikidata", "note:wikidata", "wikidata:note", "source:wikidata",
    "source:species:wikidata", "name:etymology:wikidata:fixme",
    "name:etymology:wikidata:note", "image:license:wikidata",
    "destination:ref:to:wikidata:lanes", "destination:ref:wikidata:lanes",
    "destination:ref:wikidata:lanes:forward", "destination:ref:wikidata:lanes:backward",
    "destination:ref:to:wikidata:lanes:backward",
]
EXEMPT_KEY_LIST = _EXEMPT_KEYS + [k.replace("wikidata", "wikipedia") for k in _EXEMPT_KEYS]
WARN_PARTS = ["lanes", "note", "fixme"]


def is_actual_wiki_key(key: Column) -> Column:
    """is_an_actual_wikidata_or_wikipedia_key (:641-670)."""
    cond = ~key.isin(EXEMPT_KEY_LIST)
    for part in WARN_PARTS:
        cond = cond & ~key.contains(":" + part) & ~key.contains(part + ":")
    return cond


def old_style_lang_of(key: Column) -> Column:
    """wikipedia:pl -> pl (get_text_after_first_colon on the KEY, :973)."""
    return key.substr(F.instr(key, ":") + 1, F.length(key))


def is_valid_old_style_key(key: Column) -> Column:
    """check_is_it_valid_key_for_old_style_wikipedia_tag (:851-855):
    key must be exactly 'wikipedia:' + a known language code."""
    return F.array_contains(
        F.lit([f"wikipedia:{lang}" for lang in LANGUAGE_CODES_BY_IMPORTANCE]), key
    )


# P17: geotagged-page HTML sniff (wikimedia_link_issue_reporter.py:2730-2740)

_LAT_SPAN = '<span class="latitude">'
_INLINE = "coordinates inline plainlinks"
_KML = ('><span id="coordinates"><b>Route map</b>: '
        '<a rel="nofollow" class="external text"')


def is_wikipedia_page_geotagged(page: Column) -> Column:
    """is_wikipedia_page_geotagged (:2730-2740, SURVEY.md P17): a page HTML
    blob counts as geotagged iff it has a real latitude span (inline
    coordinates don't count) or the KML route-map marker. Python str.find's
    -1 convention is reproduced via locate()-1 so the comparison chain
    (`index > inline != -1`) matches the reference exactly."""
    idx = F.locate(_LAT_SPAN, page) - 1
    inline = F.locate(_INLINE, page) - 1
    idx = F.when((inline != -1) & (idx > inline), F.lit(-1)).otherwise(idx)
    return F.when(idx == -1, (F.locate(_KML, page) - 1) != -1).otherwise(F.lit(True))
