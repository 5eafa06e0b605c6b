"""Resumable partitioned flagship: committed bands are skipped on re-run
and the union of partition outputs equals the single-pass result."""

import pandas as pd
import pytest

from wikibrain_spark import jobs
from wikibrain_spark.operators import spatial_join
from wikibrain_spark.sources import synthetic
from wikibrain_spark.streaming.checkpoint import PartitionLedger


def test_flagship_partitioned_resumes_and_matches(spark, tmp_path):
    paths = synthetic.materialize(str(tmp_path / "d"), 300)
    images = spark.read.parquet(paths["images"])
    boundaries = spark.read.parquet(paths["boundaries"])
    out = str(tmp_path / "out")

    first = jobs.flagship_partitioned(spark, images, boundaries, out, n_bands=4, input_fingerprint="v1")
    assert set(first) == {"0", "1", "2", "3"}

    second = jobs.flagship_partitioned(spark, images, boundaries, out, n_bands=4, input_fingerprint="v1")
    assert second == {}  # everything already committed

    got = (
        jobs.read_flagship_output(spark, out)
        .toPandas().sort_values(["image_id", "boundary_id"]).reset_index(drop=True)
    )
    want = (
        spatial_join.tile_assignments(images, boundaries, res=9, strategy="fused")
        .toPandas().sort_values(["image_id", "boundary_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)

    ledger = PartitionLedger(out).committed()
    assert sum(m["row_count"] for m in ledger.values()) == len(want)
    assert all(m["input_fingerprint"] == "v1" for m in ledger.values())
