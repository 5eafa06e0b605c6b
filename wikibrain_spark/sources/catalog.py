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
import shutil

from pyspark.sql import DataFrame, SparkSession


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
    if mode == "overwrite":
        if spark.catalog.tableExists(name):
            spark.sql(f"DROP TABLE {name}")
        else:
            # a warehouse directory left behind by a PREVIOUS session (whose
            # in-memory metastore died with it) makes saveAsTable fail with
            # LOCATION_ALREADY_EXISTS even though the catalog has no such
            # table — clear the orphaned location so overwrite means
            # overwrite across sessions, not just within one
            wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            loc = os.path.join(wh.removeprefix("file:"), name.lower())
            if os.path.exists(loc):
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
