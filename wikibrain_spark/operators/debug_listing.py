"""Branch-aware ontology debug listing + wiki-markup debug sink
(SURVEY.md A8/S12; reference wikimedia_link_issue_reporter.py:1910-1976).

For each debugged entity the reference prints its classifying ancestry as a
DFS preorder (':'*depth + {{Q|id}} lines), marks entries whose branch
introduces a NEW banned category (new_banned_entry_in_this_branch,
:1952-1976), and appends a wiki-markup block per banned classification to a
report file (show_in_stdout_and_in_log_file_unexpected_wikidata_structure,
:1910-1920).

Spark realization: debug listings are per-entity and their ancestor
subgraphs are tiny (bounded by ontology depth x fan-out), so the preorder
walk runs as an applyInPandas kernel per entity group — each group receives
only that entity's subgraph edges (pre-restricted via the closure), and the
DFS is a faithful reimplementation of the reference's traversal. This is a
debug surface, not the hot path; the closure restriction is what keeps it
scale-safe (no entity ever pulls the full ontology)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikibrain_spark.operators import closure as closure_ops


def _preorder_with_depth(start: str, p279: dict, p31: dict, ignored: set) -> list[dict]:
    """get_recursive_all_subclass_of_with_depth_data: DFS preorder over P279
    from `start` (start excluded), pruning ignored entries."""
    out: list[dict] = []

    def walk(node: str, depth: int, seen: tuple):
        for parent in p279.get(node, []):
            if parent in ignored or parent in seen:
                continue
            out.append({"id": parent, "depth": depth})
            walk(parent, depth + 1, seen + (parent,))

    walk(start, 0, (start,))
    return out


def _classifying_with_depth(qid: str, p279: dict, p31: dict, ignored: set) -> list[dict]:
    """wikidata_entries_classifying_entry_with_depth_data (:1455-1478):
    P279 preorder of the entity (each entry followed by its P31 instance ids
    at depth+1), then for each non-ignored P31 root of the entity its P279
    preorder plus the root itself at depth 0."""
    returned: list[dict] = []
    for entry in _preorder_with_depth(qid, p279, p31, ignored):
        returned.append(entry)
        for inst in p31.get(entry["id"], []):
            if inst not in ignored:
                returned.append({"id": inst, "depth": entry["depth"] + 1})
    for root in p31.get(qid, []):
        if root in ignored:
            continue
        returned.extend(_preorder_with_depth(root, p279, p31, ignored))
        returned.append({"id": root, "depth": 0})
    return returned


def _new_banned_entry_in_this_branch(data: list[dict], pos: int, banned: dict) -> bool:
    """Faithful port of new_banned_entry_in_this_branch (:1952-1976): an
    entry is shown iff its branch (suffix until depth returns to <= its own)
    contains a banned category AND no direct ancestor line above it in the
    preorder is already banned."""
    index = pos - 1
    relevant_level = data[pos]["depth"] - 1
    while index > 0:
        if data[index]["depth"] == relevant_level:
            relevant_level -= 1
            if data[index]["id"] in banned:
                return False
        index -= 1
    index = pos
    while True:
        if data[index]["id"] in banned:
            return True
        if index + 1 >= len(data):
            return False
        if data[index + 1]["depth"] <= data[pos]["depth"]:
            return False
        index += 1


def unexpected_structure_listing(
    qids: DataFrame,
    edges: DataFrame,
    invalid_types: DataFrame,
    ignored: list[str] | None = None,
    show_only_banned: bool = True,
) -> DataFrame:
    """qids(qid) x edges(child_qid, parent_qid, pid) ->
    (qid, ord, depth, category_id, note, ban_what, line).

    `ord` is the preorder position (the reference's print order); `line` is
    the exact ':'*depth + '{{Q|id}}' log line (:1914)."""
    spark = qids.sparkSession
    ign = set(ignored or [])

    # restrict each entity's subgraph via the closure: an edge is relevant to
    # qid iff its child is qid or one of qid's classifying ancestors
    anc = closure_ops.classifying_ancestors(edges, ignored=ignored).join(qids, "qid", "left_semi")
    anc = anc.union(qids.select("qid", F.col("qid").alias("ancestor")))
    e = edges.select(F.col("child_qid").alias("ancestor"), "parent_qid", "pid")
    sub = anc.join(e, "ancestor").select(
        "qid", F.col("ancestor").alias("child"), "parent_qid", "pid"
    )

    inv = {r["type_qid"]: r["what"] for r in invalid_types.collect()}
    bc_inv = spark.sparkContext.broadcast(inv)
    bc_ign = spark.sparkContext.broadcast(sorted(ign))

    def per_entity(key, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = key[0]
        banned = bc_inv.value
        ignored_set = set(bc_ign.value)
        p279: dict[str, list[str]] = {}
        p31: dict[str, list[str]] = {}
        for child, parent, pid in sorted(
            zip(pdf["child"], pdf["parent_qid"], pdf["pid"])
        ):
            (p279 if pid == "P279" else p31).setdefault(child, []).append(parent)
        data = _classifying_with_depth(qid, p279, p31, ignored_set)
        rows = []
        for i, entry in enumerate(data):
            cid, depth = entry["id"], entry["depth"]
            is_new_banned = _new_banned_entry_in_this_branch(data, i, banned)
            if show_only_banned and not is_new_banned:
                continue
            what = banned.get(cid)
            note = (
                f" this was unexpected here as it indicates {what} !!!!!!!!!!!!!!!!!!!!!!!!!!"
                if what is not None else ""
            )  # callback_reporting_banned_categories (:1904-1908)
            rows.append({
                "qid": qid, "ord": i, "depth": depth, "category_id": cid,
                "note": note, "ban_what": what,
                "line": ":" * depth + "{{Q|" + cid + "}}",  # :1914
            })
        return pd.DataFrame(rows, columns=["qid", "ord", "depth", "category_id",
                                           "note", "ban_what", "line"])

    return sub.groupBy("qid").applyInPandas(
        per_entity,
        "qid string, ord int, depth int, category_id string, "
        "note string, ban_what string, line string",
    )


def write_debug_report(listing: DataFrame, path: str) -> None:
    """S12 debug sink: one wiki-markup block per banned classification —
    '== {{Q|qid}} classified as {what} ==' header + the accumulated listing
    lines up to that entry (:1913-1919) — written as text files (the
    distributed analogue of the reference's appended wikidata_report.txt)."""
    blocks = (
        listing.withColumn(
            "prefix_lines",
            F.collect_list("line").over(
                Window.partitionBy("qid").orderBy("ord")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .where(F.col("ban_what").isNotNull())
        .select(
            F.concat(
                F.lit("== {{Q|"), F.col("qid"), F.lit("}} classified as "),
                F.col("ban_what"), F.lit(" ==\n"),
                F.concat_ws("\n", "prefix_lines"), F.lit("\n\n"),
            ).alias("value")
        )
    )
    blocks.write.mode("overwrite").text(path)
