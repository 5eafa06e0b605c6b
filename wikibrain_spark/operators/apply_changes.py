"""Transactional tag-change application (reference apply_changes.py:5-20).

Semantics (compare-and-swap, SURVEY.md U1/§3.3): each change has a `from`
map (prerequisites: value -> must match then delete; null -> key must be
absent) and a `to` map (key must currently be unset; non-null value ->
insert). Any violation marks the row rejected (the reference raises
PrerequisiteFailedError; we split into applied/rejected instead — the
distributed analogue of an exception).

Implemented as a single F.aggregate fold over the changes array — pure
Column expressions, JVM-side, no Python. At the sink this pairs with an
idempotent MERGE-style write keyed by element id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHANGES_TYPE = "array<struct<from:map<string,string>,to:map<string,string>>>"


def _apply_one(acc: Column, change: Column) -> Column:
    """acc: struct(ok boolean, tags map). Applies one change transactionally."""
    tags = acc["tags"]
    frm = change["from"]
    to = change["to"]
    from_ok = F.forall(
        F.map_entries(frm),
        lambda e: F.when(e["value"].isNull(), ~F.map_contains_key(tags, e["key"]))
        .otherwise(F.element_at(tags, e["key"]).eqNullSafe(e["value"])),
    )
    after_removal = F.map_filter(
        tags, lambda k, v: ~(F.map_contains_key(frm, k) & F.element_at(frm, k).isNotNull())
    )
    to_ok = F.forall(F.map_entries(to), lambda e: F.element_at(after_removal, e["key"]).isNull())
    new_tags = F.map_concat(
        after_removal,
        F.map_filter(to, lambda k, v: v.isNotNull() & ~F.map_contains_key(after_removal, k)),
    )
    ok = acc["ok"] & F.coalesce(from_ok, F.lit(True)) & F.coalesce(to_ok, F.lit(True))
    return F.struct(ok.alias("ok"), F.when(ok, new_tags).otherwise(tags).alias("tags"))


def apply_tag_changes(
    df: DataFrame, tags_col: str = "tags", changes_col: str = "changes"
) -> DataFrame:
    """Adds `prereq_ok` (boolean) and `new_tags` (map). Rows with failed
    prerequisites keep their original tags and prereq_ok=false."""
    init = F.struct(F.lit(True).alias("ok"), F.col(tags_col).alias("tags"))
    folded = F.aggregate(F.col(changes_col), init, _apply_one)
    return df.withColumn("prereq_ok", folded["ok"]).withColumn(
        "new_tags", F.when(folded["ok"], folded["tags"]).otherwise(F.col(tags_col))
    )


def split_applied_rejected(df: DataFrame, **kw) -> tuple[DataFrame, DataFrame]:
    """(applied, rejected) — the distributed analogue of raise-vs-return."""
    out = apply_tag_changes(df, **kw)
    return out.where(F.col("prereq_ok")), out.where(~F.col("prereq_ok"))
