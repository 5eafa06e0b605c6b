"""Resumable partitioned execution: per-partition checkpoint ledger with
lineage + metrics (north rule: "resumable from per-partition checkpoints
with lineage + row-count/PSNR metrics emitted per partition").

Design (SURVEY.md §2.8): the job is a driver loop over coarse spatial
partitions (hexlite cells at a low resolution). Each partition commits
atomically: output parquet written to a staging dir, then a ledger row
(partition key, row count, metrics, input fingerprint, wall time) is
appended; a partition with a ledger row is SKIPPED on re-run. This is the
Iceberg-commit-per-partition pattern expressed on plain parquet — swap the
sink when an Iceberg catalog is available (the layout is compatible:
one directory per partition key + a ledger table).

Idempotence: re-running a half-finished job re-processes only partitions
without ledger entries; a crashed partition leaves staging garbage that is
overwritten on retry (rename-free object-store-safe layout: the ledger is
the source of truth, not directory listing).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_NAME = "_ledger"


class PartitionLedger:
    """Append-only JSON-lines ledger of committed partitions."""

    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, LEDGER_NAME + ".jsonl")
        os.makedirs(root, exist_ok=True)

    def committed(self) -> dict[str, dict]:
        out: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as fh:
                for line in fh:
                    if line.strip():
                        row = json.loads(line)
                        out[row["partition"]] = row
        return out

    def commit(self, partition: str, metrics: dict) -> None:
        row = {"partition": partition, "committed_at": time.time(), **metrics}
        with open(self.path, "a") as fh:
            fh.write(json.dumps(row) + "\n")
            fh.flush()
            os.fsync(fh.fileno())

    def metrics_df(self, spark: SparkSession) -> DataFrame:
        rows = list(self.committed().values())
        if not rows:
            return spark.createDataFrame([], "partition string, row_count long")
        return spark.createDataFrame([json.dumps(r) for r in rows], "string").select(
            F.from_json(
                "value",
                "partition string, committed_at double, row_count long, "
                "elapsed_sec double, input_fingerprint string, min_psnr double",
            ).alias("r")
        ).select("r.*")


def run_partitioned(
    spark: SparkSession,
    partition_keys: list[str],
    make_partition_df: Callable[[str], DataFrame],
    out_root: str,
    input_fingerprint: str = "",
    psnr_col: str | None = None,
) -> dict[str, dict]:
    """Process each partition exactly once across re-runs.

    make_partition_df(key) returns the partition's output DataFrame. Each
    commit writes parquet to out_root/partition=<key>/ and appends a ledger
    row with row_count, elapsed, lineage fingerprint, and min PSNR when a
    psnr_col exists. Returns this run's newly committed metrics by key.
    """
    ledger = PartitionLedger(out_root)
    done = ledger.committed()
    newly: dict[str, dict] = {}
    for key in partition_keys:
        if key in done:
            continue
        t0 = time.time()
        df = make_partition_df(key)
        part_dir = os.path.join(out_root, f"partition={key}")
        aggs = [F.count("*").alias("row_count")]
        if psnr_col is not None:
            aggs.append(F.min(psnr_col).alias("min_psnr"))
        df = df.persist()
        df.write.mode("overwrite").parquet(part_dir)
        stats = df.agg(*aggs).collect()[0].asDict()
        df.unpersist()
        metrics = {
            "row_count": int(stats["row_count"]),
            "elapsed_sec": round(time.time() - t0, 3),
            "input_fingerprint": input_fingerprint,
        }
        if psnr_col is not None and stats.get("min_psnr") is not None:
            metrics["min_psnr"] = float(stats["min_psnr"])
        ledger.commit(key, metrics)
        newly[key] = metrics
    return newly
