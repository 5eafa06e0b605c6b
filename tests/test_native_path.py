"""The fully-JVM flagship path (native binary f64 parse + native even-odd
PIP) must agree exactly with the Python-kernel path."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from wikibrain_spark import codecs
from wikibrain_spark.functions import binparse
from wikibrain_spark.operators import geotag, spatial_join
from wikibrain_spark.sources import synthetic


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    return synthetic.materialize(str(tmp_path_factory.mktemp("nat")), 300)


def test_native_f64_parse_exact(spark, paths):
    images = spark.read.parquet(paths["images"])
    got = images.select(
        "image_id",
        binparse.le_double_col(F.col("bytes"), 11).alias("lat"),
        binparse.le_double_col(F.col("bytes"), 19).alias("lon"),
    ).toPandas().sort_values("image_id").reset_index(drop=True)
    want = pd.read_parquet(paths["expected_geotags"]).sort_values("image_id").reset_index(drop=True)
    np.testing.assert_array_equal(got["lat"].to_numpy(), want["lat"].to_numpy())  # bit-exact
    np.testing.assert_array_equal(got["lon"].to_numpy(), want["lon"].to_numpy())


def test_native_f64_hard_values(spark):
    vals = [0.0, -0.0, 1.0, -1.0, 180.0, -179.999999, 1e-10, -89.99999999, 52.52]
    rows = [(str(i), codecs.pack_header("ppm", 1, 1, v, -v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id string, bytes binary")
    got = df.select(
        "id",
        binparse.le_double_col(F.col("bytes"), 11).alias("lat"),
        binparse.le_double_col(F.col("bytes"), 19).alias("lon"),
    ).toPandas().sort_values("id", key=lambda s: s.astype(int)).reset_index(drop=True)
    np.testing.assert_array_equal(got["lat"].to_numpy(), np.array(vals))
    np.testing.assert_array_equal(got["lon"].to_numpy(), -np.array(vals))


def test_native_pip_matches_kernel_path(spark, paths):
    images = spark.read.parquet(paths["images"])
    boundaries = spark.read.parquet(paths["boundaries"])
    native = spatial_join.tile_assignments(images, boundaries, res=9, strategy="native")
    pts = geotag.extract_geotags(images, with_s2=False)
    python_path = spatial_join.tile_assignments(pts, boundaries, res=9, strategy="broadcast")
    a = native.toPandas().sort_values(["image_id", "boundary_id"]).reset_index(drop=True)
    b = python_path.toPandas().sort_values(["image_id", "boundary_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_native_plan_has_no_python(spark, paths):
    images = spark.read.parquet(paths["images"])
    boundaries = spark.read.parquet(paths["boundaries"])
    plan = spatial_join.tile_assignments(
        images, boundaries, res=9, strategy="native"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # no ArrowEvalPython / MapInPandas stages
