"""A8/S12: branch-aware preorder debug listing + wiki-markup debug sink,
hand-traced against the reference's new_banned_entry_in_this_branch /
show_in_stdout_and_in_log_file_unexpected_wikidata_structure semantics
(wikimedia_link_issue_reporter.py:1910-1976) on a fixture tree."""

import os

from wikibrain_spark.functions import knowledge
from wikibrain_spark.operators import debug_listing

# Q1 -P31-> QA -P279-> QB -P279-> Q5 (banned: 'a human')
# Q1 -P31-> QC -P279-> QD          (benign branch)
EDGES = [
    ("Q1", "QA", "P31"),
    ("Q1", "QC", "P31"),
    ("QA", "QB", "P279"),
    ("QB", "Q5", "P279"),
    ("QC", "QD", "P279"),
]
# classifying-with-depth preorder (:1455-1478): for root QA -> [QB@0, Q5@1,
# QA@0]; for root QC -> [QD@0, QC@0]; data = [QB0, Q5_1, QA0, QD0, QC0].
# new_banned_entry_in_this_branch: QB (branch suffix reaches banned Q5) and
# Q5 itself are shown; QA is listed AFTER its branch (preorder appends the
# root last), so its forward scan stops at QD(depth 0) -> not shown.
EXPECTED_BANNED = [("QB", 0, "{{Q|QB}}"), ("Q5", 1, ":{{Q|Q5}}")]
EXPECTED_FULL_ORDER = ["QB", "Q5", "QA", "QD", "QC"]


def _fixture(spark):
    qids = spark.createDataFrame([("Q1",)], "qid string")
    edges = spark.createDataFrame(EDGES, "child_qid string, parent_qid string, pid string")
    return qids, edges


def test_banned_only_listing(spark):
    qids, edges = _fixture(spark)
    rows = (
        debug_listing.unexpected_structure_listing(
            qids, edges, knowledge.invalid_types_df(spark),
            ignored=knowledge.ontology_ignore_list(), show_only_banned=True,
        )
        .orderBy("ord").collect()
    )
    got = [(r["category_id"], r["depth"], r["line"]) for r in rows]
    assert got == EXPECTED_BANNED
    assert "a human" in rows[1]["note"] and rows[1]["note"].endswith("!" * 26)
    assert rows[0]["ban_what"] is None and rows[1]["ban_what"] == "a human"


def test_full_listing_preorder(spark):
    qids, edges = _fixture(spark)
    rows = (
        debug_listing.unexpected_structure_listing(
            qids, edges, knowledge.invalid_types_df(spark),
            ignored=knowledge.ontology_ignore_list(), show_only_banned=False,
        )
        .orderBy("ord").collect()
    )
    assert [r["category_id"] for r in rows] == EXPECTED_FULL_ORDER
    assert [r["depth"] for r in rows] == [0, 1, 0, 0, 0]


def test_debug_report_sink(spark, tmp_path):
    qids, edges = _fixture(spark)
    listing = debug_listing.unexpected_structure_listing(
        qids, edges, knowledge.invalid_types_df(spark),
        ignored=knowledge.ontology_ignore_list(), show_only_banned=True,
    )
    out = os.path.join(str(tmp_path), "report")
    debug_listing.write_debug_report(listing, out)
    text = "\n".join(
        r["value"] for r in spark.read.text(out).collect()
    )
    assert "== {{Q|Q1}} classified as a human ==" in text
    assert "{{Q|QB}}" in text and ":{{Q|Q5}}" in text
