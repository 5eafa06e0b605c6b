"""Resumability: partitions commit exactly once; re-runs skip committed
partitions; metrics land in the ledger."""

import pytest
from pyspark.sql import functions as F

from wikibrain_spark.streaming.checkpoint import PartitionLedger, run_partitioned


def test_run_partitioned_commits_and_resumes(spark, tmp_path):
    out = str(tmp_path / "out")
    calls = []

    def make(key):
        calls.append(key)
        return spark.range(int(key) * 10, int(key) * 10 + 5).select(
            F.col("id"), F.lit(key).alias("part")
        )

    first = run_partitioned(spark, ["1", "2", "3"], make, out, input_fingerprint="fp1")
    assert set(first) == {"1", "2", "3"}
    assert all(m["row_count"] == 5 for m in first.values())
    assert calls == ["1", "2", "3"]

    # resume: nothing re-processed, new partition picked up
    second = run_partitioned(spark, ["1", "2", "3", "4"], make, out, input_fingerprint="fp1")
    assert set(second) == {"4"}
    assert calls == ["1", "2", "3", "4"]

    ledger = PartitionLedger(out)
    committed = ledger.committed()
    assert set(committed) == {"1", "2", "3", "4"}
    assert committed["1"]["input_fingerprint"] == "fp1"

    # committed data is readable per partition
    df = spark.read.parquet(f"{out}/partition=2")
    assert df.count() == 5


def test_ledger_metrics_df(spark, tmp_path):
    out = str(tmp_path / "m")
    run_partitioned(spark, ["7"], lambda k: spark.range(3), out)
    mdf = PartitionLedger(out).metrics_df(spark)
    rows = {r["partition"]: r for r in mdf.collect()}
    assert rows["7"]["row_count"] == 3
