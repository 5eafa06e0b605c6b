"""End-to-end driver jobs: the flagship pipeline with per-partition
resumability (north rule: partitioned state keyed by spatial cell,
resumable from per-partition checkpoints with lineage + metrics).

Partitioning: coarse latitude bands of the tile grid (a prefix of the
hexlite cell key). At test scale the banded filter re-reads a cached
DataFrame; at 100 TB the input arrives partitioned by cell prefix
(Iceberg/parquet partition keys), so each band's scan prunes to its own
files — same driver loop, pruned physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikibrain_spark.geo import cells
from wikibrain_spark.operators import spatial_join
from wikibrain_spark.streaming.checkpoint import PartitionLedger, run_partitioned


def flagship_partitioned(
    spark: SparkSession,
    images: DataFrame,
    boundaries: DataFrame,
    out_root: str,
    n_bands: int = 8,
    res: int = 9,
    input_fingerprint: str = "",
) -> dict[str, dict]:
    """Run tile assignment band-by-band with ledger commits; re-runs skip
    committed bands. Returns this run's newly committed metrics."""
    tiles = spatial_join.tile_assignments(images, boundaries, res=res, strategy="fused")
    # band = latitude prefix of the tile cell key (the 'keyed by H3 cell'
    # partitioning): decode lat_idx from the packed cell id
    n_lat, _ = cells.hexlite_dims(res)
    lat_idx = F.shiftright(f"cell_r{res}", 28).bitwiseAND(F.lit((1 << 28) - 1))
    tiles = tiles.withColumn(
        "band", F.least(F.floor(lat_idx * n_bands / n_lat), F.lit(n_bands - 1)).cast("int")
    ).persist()

    def make(band: str) -> DataFrame:
        return tiles.where(F.col("band") == int(band)).drop("band")

    try:
        return run_partitioned(
            spark, [str(b) for b in range(n_bands)], make, out_root,
            input_fingerprint=input_fingerprint,
        )
    finally:
        tiles.unpersist()


def read_flagship_output(spark: SparkSession, out_root: str) -> DataFrame:
    """Union of all committed partitions (ledger is the source of truth)."""
    ledger = PartitionLedger(out_root)
    parts = sorted(ledger.committed())
    if not parts:
        raise ValueError(f"no committed partitions under {out_root}")
    df = None
    for p in parts:
        part_df = spark.read.parquet(f"{out_root}/partition={p}")
        df = part_df if df is None else df.unionByName(part_df)
    return df
