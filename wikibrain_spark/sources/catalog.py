"""Table catalog shim: Iceberg-compatible layout on plain parquet.

The sandbox has no Iceberg runtime jar (SURVEY.md §7.0), so state tables
are managed-catalog parquet with explicit partition/bucket specs — the
same physical layout an Iceberg catalog would manage. Everything below is
behind this module so swapping in a real catalog is a one-file change.

Why bucketing matters at 100 TB: two tables bucketed by the same key into
the same bucket count join WITHOUT a shuffle (SortMergeJoin reads
co-located buckets). For the engine: points and per-cell state tables are
bucketed by the cell key, so repeated cell-keyed joins/aggregations reuse
the physical layout instead of re-shuffling 100 TB per query.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

# unqualified bare table names only: the orphan-cleanup path maps a name to
# <warehouse>/<name.lower()>, which is simply WRONG for db-qualified names
# (db.tbl lives under <warehouse>/db.db/tbl) and dangerous for anything
# carrying path separators
_SAFE_NAME = re.compile(r"[A-Za-z0-9_]+")

# file names a Spark-managed parquet table directory may contain; anything
# else means the directory is NOT an orphaned table and must not be deleted
_TABLE_FILE = re.compile(r"(part-.*|_SUCCESS|_committed.*|_started.*|\..*\.crc)")


def _is_orphaned_table_dir(loc: str) -> bool:
    """True iff every entry under loc looks like Spark table output."""
    for root, _dirs, files in os.walk(loc):
        for f in files:
            if not _TABLE_FILE.fullmatch(f):
                return False
    return True


def save_table(
    df: DataFrame,
    name: str,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a managed table with optional partition + bucket spec."""
    spark = df.sparkSession
    if not _SAFE_NAME.fullmatch(name):
        raise ValueError(f"table name must be a bare [A-Za-z0-9_]+ identifier: {name!r}")
    if mode == "overwrite":
        if spark.catalog.tableExists(name):
            spark.sql(f"DROP TABLE {name}")
        else:
            # a warehouse directory left behind by a PREVIOUS session (whose
            # in-memory metastore died with it) makes saveAsTable fail with
            # LOCATION_ALREADY_EXISTS even though the catalog has no such
            # table — clear the orphaned location so overwrite means
            # overwrite across sessions, not just within one. Delete ONLY
            # when the directory's contents look like Spark table output;
            # an unrelated directory that happens to share the name is the
            # user's data, and a loud error beats silently eating it
            wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            loc = os.path.join(wh.removeprefix("file:"), name.lower())
            if os.path.exists(loc):
                if not _is_orphaned_table_dir(loc):
                    raise ValueError(
                        f"refusing to overwrite {loc}: directory exists but its "
                        "contents do not look like an orphaned Spark table"
                    )
                shutil.rmtree(loc)
    writer = df.write.mode(mode).format("parquet")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols)
        writer = writer.sortBy(*(sort_by or cols))
    writer.saveAsTable(name)


def load_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)


def table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


def drop_table(spark: SparkSession, name: str) -> None:
    """Drop a managed table if it exists (no-op otherwise). Same name
    guard as save_table: the name is interpolated into SQL, and callers
    (materialized_closure et al.) pass user-supplied table names through
    here, so the two entry points must enforce one contract."""
    if not _SAFE_NAME.fullmatch(name):
        raise ValueError(f"table name must be a bare [A-Za-z0-9_]+ identifier: {name!r}")
    if spark.catalog.tableExists(name):
        spark.sql(f"DROP TABLE {name}")
