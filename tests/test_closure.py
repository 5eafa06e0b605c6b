import pytest
from pyspark.sql import functions as F

from wikibrain_spark.operators import closure


def _edges(spark, rows):
    return spark.createDataFrame(rows, "child_qid string, parent_qid string, pid string")


def test_p279_closure_chain(spark):
    e = _edges(spark, [("A", "B", "P279"), ("B", "C", "P279"), ("C", "D", "P279")])
    got = {(r["qid"], r["ancestor"]) for r in closure.p279_closure(e.where("pid='P279'")).collect()}
    assert ("A", "D") in got and ("A", "A") in got and ("B", "D") in got
    assert ("D", "A") not in got


def test_p279_closure_cycle_terminates(spark):
    e = _edges(spark, [("A", "B", "P279"), ("B", "A", "P279")])
    got = {(r["qid"], r["ancestor"]) for r in closure.p279_closure(e).collect()}
    assert got == {("A", "A"), ("A", "B"), ("B", "A"), ("B", "B")}


def test_ignore_list_prunes_traversal(spark):
    # A -> HUB -> Z ; HUB ignored: Z must not become A's ancestor
    e = _edges(spark, [("A", "HUB", "P279"), ("HUB", "Z", "P279")])
    got = {(r["qid"], r["ancestor"]) for r in closure.p279_closure(e, ignored=["HUB"]).collect()}
    assert ("A", "Z") not in got and ("A", "HUB") not in got


def test_classifying_ancestors_union_semantics(spark):
    # X --P31--> R --P279--> S ; X --P279--> T
    e = _edges(spark, [("X", "R", "P31"), ("R", "S", "P279"), ("X", "T", "P279")])
    got = {(r["qid"], r["ancestor"]) for r in closure.classifying_ancestors(e).collect() if r["qid"] == "X"}
    assert {("X", "T"), ("X", "R"), ("X", "S"), ("X", "X")}.issubset(got)


def test_instance_types_excludes_own_p279(spark):
    # instance types = P31 roots + their closure; X's own P279 line excluded
    e = _edges(spark, [("X", "R", "P31"), ("R", "S", "P279"), ("X", "T", "P279")])
    got = {(r["qid"], r["type_qid"]) for r in closure.instance_types(e).collect() if r["qid"] == "X"}
    assert ("X", "R") in got and ("X", "S") in got
    assert ("X", "T") not in got
