"""Static knowledge dimension tables (public Wikidata/OSM facts).

The data in knowledge_tables.json carries the same public facts the
reference embeds as literals (SURVEY.md §1.1 'static knowledge tables'):
  - invalid_primary_link_types: QID -> {what, replacement,
    extremely_broad_and_unspecific?} (~175 rows,
    wikimedia_link_issue_reporter.py:1539-1732)
  - blacklist_of_unlinkable_entries: QID -> {prefix, ...} (~1800 rows,
    wikidata_knowledge.py:33)
  - skipped_cases whitelist (wikidata_knowledge.py:1-19)
  - ontology ignore lists (wikimedia_link_issue_reporter.py:63-262)

Loaded as broadcast-sized DataFrames / plain lists. Pure data, no logic.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

_JSON_PATH = os.path.join(os.path.dirname(__file__), "knowledge_tables.json")


@lru_cache(maxsize=1)
def _tables() -> dict:
    with open(_JSON_PATH) as fh:
        return json.load(fh)


def skipped_cases() -> list[str]:
    return list(_tables()["skipped_cases"])


def ontology_ignore_list() -> list[str]:
    t = _tables()
    return sorted(set(t["ontology_ignore_workarounds"]) | set(t["ontology_ignore_complicated"]))


def invalid_types_df(spark: SparkSession) -> DataFrame:
    rows = [
        (qid, v["what"], v.get("replacement"), bool(v.get("extremely_broad_and_unspecific", False)))
        for qid, v in _tables()["invalid_primary_link_types"].items()
    ]
    return spark.createDataFrame(
        rows, "type_qid string, what string, replacement string, is_broad boolean"
    )


def invalid_types_rows() -> list[tuple[str, str, str | None, bool]]:
    """(type_qid, what, replacement, is_broad) rows as plain Python — used by
    the classification-corpus generator (sources/synthetic.py)."""
    return [
        (qid, v["what"], v.get("replacement"), bool(v.get("extremely_broad_and_unspecific", False)))
        for qid, v in sorted(_tables()["invalid_primary_link_types"].items())
    ]


def official_language_countries(lang: str | None) -> list[str]:
    """Country QIDs where `lang` is official (public Wikidata CSV-derived,
    same facts as wikimedia_link_issue_reporter.py:1978-2653)."""
    if lang is None:
        return []
    return list(_tables().get("official_language_countries", {}).get(lang, []))


def blacklist_df(spark: SparkSession) -> DataFrame:
    rows = [
        (qid, v.get("prefix"))
        for qid, v in _tables()["blacklist_of_unlinkable_entries"].items()
    ]
    return spark.createDataFrame(rows, "qid string, prefix string")
