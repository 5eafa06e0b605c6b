"""Depth-tracked closure (J8/A8) and disambig candidate ranking (J14)."""

import pytest
from pyspark.sql import functions as F

from wikibrain_spark.operators import closure, disambig
from wikibrain_spark.sources import synthetic


def test_depth_closure_min_depths(spark):
    e = spark.createDataFrame(
        [("A", "B", "P279"), ("B", "C", "P279"), ("A", "C", "P279")],
        "child_qid string, parent_qid string, pid string",
    )
    got = {(r["qid"], r["ancestor"]): r["depth"] for r in closure.p279_closure_with_depth(e).collect()}
    assert got[("A", "A")] == 0
    assert got[("A", "B")] == 1
    assert got[("A", "C")] == 1  # direct edge wins over the 2-hop path
    assert got[("B", "C")] == 1


def test_disambig_candidates_ranked_by_distance(spark):
    d = synthetic.generate_wikidata_dim()
    pages = spark.createDataFrame(d["wikipedia_pages"], "lang string, title string, qid string")
    wikidata = spark.createDataFrame(
        d["wikidata"], "qid string, label_en string, sitelinks map<string,string>, lat double, lon double"
    )
    dlinks = spark.createDataFrame(d["disambig_links"], "lang string, title string, out_title string, ns int")
    # element near Hilltop (-33.9, 151.2): Hilltop should rank before Megapolis
    elements = spark.createDataFrame(
        [(1, -33.8, 151.1, "Q999001", "en:Megapolis (disambiguation)")],
        "element_id long, lat double, lon double, qid string, best_link string",
    )
    rows = disambig.disambig_candidates(elements, dlinks, pages, wikidata).collect()
    assert len(rows) == 1
    cands = rows[0]["candidates"]
    titles = [c["title"] for c in cands]
    assert titles[0] == "Hilltop"
    assert titles[1] == "Megapolis"
    assert "Talk:Megapolis" not in titles  # ns != 0 dropped
    # Brand Thing has no coordinates -> sorts last with the no-location note
    assert titles[-1] == "Brand Thing"
    assert cands[-1]["dist_km"] is None
    assert cands[-1]["dist_human"] == "<no location data on wikidata>"
    assert cands[0]["dist_human"].endswith(" km")
