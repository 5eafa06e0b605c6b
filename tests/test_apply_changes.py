"""Golden in/out cases for the CAS tag-change applier, mirroring the
reference's test_apply_changes.py:12-52 (raise -> prereq_ok=false here)."""

import pytest

from wikibrain_spark.operators.apply_changes import CHANGES_TYPE, apply_tag_changes

SCHEMA = f"id int, tags map<string,string>, changes {CHANGES_TYPE}"


def run(spark, tags, changes):
    df = spark.createDataFrame([(1, tags, changes)], SCHEMA)
    row = apply_tag_changes(df).collect()[0]
    return row["prereq_ok"], dict(row["new_tags"])


def test_noop(spark):
    ok, out = run(spark, {"a": "b"}, [])
    assert ok and out == {"a": "b"}


def test_plain_add(spark):
    ok, out = run(spark, {}, [{"from": {}, "to": {"key": "value"}}])
    assert ok and out == {"key": "value"}


def test_remove_with_matching_prerequisite(spark):
    ok, out = run(spark, {"key": "value"}, [{"from": {"key": "value"}, "to": {}}])
    assert ok and out == {}


def test_swap_value(spark):
    ok, out = run(spark, {"k": "old"}, [{"from": {"k": "old"}, "to": {"k": "new"}}])
    assert ok and out == {"k": "new"}


def test_failed_from_value_mismatch(spark):
    ok, out = run(spark, {"k": "other"}, [{"from": {"k": "old"}, "to": {}}])
    assert not ok and out == {"k": "other"}  # original preserved


def test_failed_from_missing_key(spark):
    ok, _ = run(spark, {}, [{"from": {"k": "old"}, "to": {}}])
    assert not ok


def test_failed_from_null_requires_absence(spark):
    # from {k: None} means k must be absent (apply_changes.py:12-14)
    ok, _ = run(spark, {"k": "v"}, [{"from": {"k": None}, "to": {}}])
    assert not ok
    ok2, out2 = run(spark, {}, [{"from": {"k": None}, "to": {"k": "v"}}])
    assert ok2 and out2 == {"k": "v"}


def test_failed_to_key_already_set(spark):
    # to key must not be set (apply_changes.py:16-17)
    ok, _ = run(spark, {"k": "v"}, [{"from": {}, "to": {"k": "other"}}])
    assert not ok


def test_to_null_means_no_insert(spark):
    ok, out = run(spark, {}, [{"from": {}, "to": {"k": None}}])
    assert ok and out == {}


def test_sequential_changes(spark):
    changes = [
        {"from": {"a": "1"}, "to": {"b": "2"}},
        {"from": {"b": "2"}, "to": {"c": "3"}},
    ]
    ok, out = run(spark, {"a": "1"}, changes)
    assert ok and out == {"b": "2", "c": "3"} or out == {"c": "3"}
    # second change consumes the first's output: a removed, b added then
    # removed, c added
    assert ok and out == {"c": "3"}
