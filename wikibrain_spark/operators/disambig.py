"""Disambiguation-candidate distance ranking (SURVEY.md J14 — the
reference's kNN seed: wikimedia_link_issue_reporter.py:1387-1408).

For elements whose effective wikidata entry is a disambiguation page,
produce the disambig page's outlinks ranked by geodesic distance from the
element — the candidate list a fixer chooses the correct target from.

All joins are against broadcast-sized dims (disambig outlinks, pages,
wikidata coords); the only per-element state is the final ordered
collect_list (window over element).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikibrain_spark.geo.geodesic import distance_human_string_col, haversine_km_col


def disambig_candidates(
    elements: DataFrame,
    disambig_links: DataFrame,   # lang, title, out_title, ns
    pages: DataFrame,            # lang, title, qid
    wikidata: DataFrame,         # qid, ..., lat, lon
    qid_col: str = "qid",
    link_col: str = "best_link",
) -> DataFrame:
    """elements(element_id, lat, lon, <qid_col>, <link_col 'lang:title'>) ->
    (element_id, candidates array<struct<title, qid, dist_km, dist_human>>)
    ordered nearest-first (ties by title). Only ns=0 outlinks are considered
    (:1357-1359)."""
    el = elements.select(
        "element_id", F.col("lat").alias("e_lat"), F.col("lon").alias("e_lon"),
        F.substring_index(link_col, ":", 1).alias("lang"),
        F.col(link_col).substr(F.instr(F.col(link_col), ":") + 1, F.length(link_col)).alias("title"),
    )
    links = disambig_links.where(F.col("ns") == 0).select("lang", "title", "out_title")
    cand = el.join(F.broadcast(links), ["lang", "title"])
    p = pages.select(F.col("lang"), F.col("title").alias("out_title"), F.col("qid").alias("cand_qid"))
    cand = cand.join(F.broadcast(p), ["lang", "out_title"], "left")
    coords = wikidata.select(F.col("qid").alias("cand_qid"),
                             F.col("lat").alias("c_lat"), F.col("lon").alias("c_lon"))
    cand = cand.join(F.broadcast(coords), "cand_qid", "left")
    dist = F.when(
        F.col("c_lat").isNotNull() & F.col("e_lat").isNotNull(),
        haversine_km_col(F.col("e_lat"), F.col("e_lon"), F.col("c_lat"), F.col("c_lon")),
    )
    cand = cand.select(
        "element_id", "out_title", "cand_qid", dist.alias("dist_km"),
        F.coalesce(distance_human_string_col(dist), F.lit("<no location data on wikidata>")).alias("dist_human"),
    )
    return (
        cand.groupBy("element_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(
                    # sort key first: (has-distance, distance, title)
                    F.coalesce("dist_km", F.lit(1e18)).alias("_k"),
                    F.col("out_title").alias("title"),
                    F.col("cand_qid").alias("qid"),
                    F.col("dist_km").alias("dist_km"),
                    F.col("dist_human").alias("dist_human"),
                ))
            ).alias("raw")
        )
        .select(
            "element_id",
            F.transform(
                "raw",
                lambda s: F.struct(s["title"].alias("title"), s["qid"].alias("qid"),
                                   s["dist_km"].alias("dist_km"), s["dist_human"].alias("dist_human")),
            ).alias("candidates"),
        )
    )
