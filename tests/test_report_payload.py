"""Golden tests for the FULL ErrorReport payload (SURVEY.md P19/S11):
prerequisite + proposed_tagging_changes + error_general_intructions +
bind_to_element fields, matching the reference's constructions
(wikimedia_link_issue_reporter.py:11-45 and every cited error site), and the
end-to-end round-trip resolve -> proposed_tagging_changes -> apply_tag_changes.
"""

import pytest
from pyspark.sql import functions as F

from wikibrain_spark.operators import linkres
from wikibrain_spark.operators.apply_changes import apply_tag_changes
from wikibrain_spark.sources import synthetic

ELEMENTS_SCHEMA = (
    "element_id long, object_type string, tags map<string,string>, "
    "lat double, lon double, expected_error_id string"
)


@pytest.fixture(scope="module")
def dims(spark):
    d = synthetic.generate_wikidata_dim()
    return linkres.WikiDims(
        wikidata=spark.createDataFrame(
            d["wikidata"], "qid string, label_en string, sitelinks map<string,string>, lat double, lon double"
        ),
        claims=spark.createDataFrame(
            d["wikidata_claims"],
            "qid string, pid string, value_str string, value_qid string, "
            "value_lat double, value_lon double, qualifier_pids array<string>",
        ),
        pages=spark.createDataFrame(d["wikipedia_pages"], "lang string, title string, qid string"),
        page_redirects=spark.createDataFrame(
            d["wikipedia_redirects"], "lang string, from_title string, to_title string"
        ),
        qid_redirects=spark.createDataFrame(d["wikidata_redirects"], "from_qid string, to_qid string"),
        edges=spark.createDataFrame(d["ontology_edges"], "child_qid string, parent_qid string, pid string"),
    )


@pytest.fixture(scope="module")
def resolved(spark, dims):
    elements = spark.createDataFrame(synthetic.generate_test_elements(), ELEMENTS_SCHEMA)
    out = linkres.resolve(elements.drop("expected_error_id"), dims)
    got = out.select(
        "element_id", "error_id", "error_message", "error_general_intructions",
        linkres.ser_map_col(F.col("prerequisite")).alias("pre_ser"),
        linkres.ser_changes_col(F.col("proposed_tagging_changes")).alias("prop_ser"),
        "osm_object_url", "location", "tags", "proposed_tagging_changes",
    ).toPandas().set_index("element_id")
    return got


def test_prerequisites_match_reference(resolved):
    want = synthetic.golden_payload_expectations()
    failures = []
    for _, row in want.iterrows():
        eid = row["element_id"]
        if eid not in resolved.index:
            failures.append(f"#{eid}: no report emitted at all")
            continue
        got_pre = resolved.loc[eid, "pre_ser"]
        if got_pre != row["expected_prerequisite"]:
            failures.append(
                f"#{eid} {dict(row['tags'])}: prerequisite\n  got  {got_pre!r}\n"
                f"  want {row['expected_prerequisite']!r}"
            )
    assert not failures, "\n".join(failures)


def test_proposed_changes_match_reference(resolved):
    want = synthetic.golden_payload_expectations()
    failures = []
    for _, row in want.iterrows():
        eid = row["element_id"]
        if eid not in resolved.index:
            continue
        got = resolved.loc[eid, "prop_ser"]
        exp = row["expected_proposed"]
        if got != exp:
            failures.append(
                f"#{eid} {dict(row['tags'])}: proposed\n  got  {got!r}\n  want {exp!r}"
            )
    assert not failures, "\n".join(failures)


def test_bind_to_element_fields(resolved):
    """bind_to_element (:25-31): url, location, tags ride with the report."""
    want = synthetic.generate_test_elements().set_index("element_id")
    for eid in resolved.index:
        row = resolved.loc[eid]
        src = want.loc[eid]
        assert row["osm_object_url"] == f"https://www.openstreetmap.org/{src['object_type']}/{eid}"
        assert row["location"]["lat"] == pytest.approx(src["lat"])
        assert dict(row["tags"]) == dict(src["tags"])


def test_instructions_present_where_reference_sets_them(resolved):
    by_err = resolved.reset_index().set_index("error_id")["error_general_intructions"]
    # wp404 (:703-706), existence (:726), brand (:768) carry instructions
    assert by_err["wikipedia tag links to 404"].startswith(
        "Wikipedia article linked from OSM object using wikipedia tag is missing.\n"
    )
    assert "Wikidata claims that this object no longer exists." in by_err[
        "no longer existing object (according to Wikidata)"
    ]
    # plain malformed tags carry none (reference leaves the field None)
    assert by_err["malformed wikipedia tag"] is None


def test_roundtrip_apply_proposed_changes(spark, resolved, dims):
    """resolve -> proposed_tagging_changes -> apply_tag_changes: every
    proposing report's change applies cleanly to its own element (prereq_ok),
    and produces the reference's post-edit tag state."""
    elements = spark.createDataFrame(synthetic.generate_test_elements(), ELEMENTS_SCHEMA)
    out = linkres.resolve(elements.drop("expected_error_id"), dims)
    proposing = out.where(F.col("proposed_tagging_changes").isNotNull()).select(
        "element_id", "tags", F.col("proposed_tagging_changes").alias("changes")
    )
    applied = apply_tag_changes(proposing).toPandas().set_index("element_id")
    assert len(applied) >= 5
    assert applied["prereq_ok"].all(), applied[~applied["prereq_ok"]]

    # reference-pinned post-states, computed independently in plain Python
    want = synthetic.golden_payload_expectations().set_index("element_id")
    for eid, row in applied.iterrows():
        chs = want.loc[eid, "expected_proposed_raw"]
        tags = dict(want.loc[eid, "tags"])
        for ch in chs:
            for k, v in ch["from"].items():
                if v is not None:
                    assert tags.pop(k) == v
            for k, v in ch["to"].items():
                if v is not None:
                    tags[k] = v
        assert dict(row["new_tags"]) == tags, f"#{eid}"


def test_double_apply_rejected(spark):
    """CAS semantics: re-applying a consumed change fails its prerequisite."""
    df = spark.createDataFrame(
        [(1, {"wikipedia": "en:Old"})], "element_id long, tags map<string,string>"
    ).withColumn(
        "changes",
        F.expr("array(named_struct('from', map('wikipedia', 'en:Old'), "
               "'to', map('wikipedia', 'en:New')))").cast(linkres.CHANGES_TYPE),
    )
    once = apply_tag_changes(df)
    twice = apply_tag_changes(once.select("element_id", F.col("new_tags").alias("tags"), "changes"))
    r1 = once.collect()[0]
    r2 = twice.collect()[0]
    assert r1["prereq_ok"] and dict(r1["new_tags"]) == {"wikipedia": "en:New"}
    assert not r2["prereq_ok"]
