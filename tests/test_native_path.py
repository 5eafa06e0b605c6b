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


def test_native_pip_survives_large_polygon_set(spark):
    """Round-1 verdict 'what's wrong #4': the literal-inlining formulation hit
    Janino's 64 KB codegen ceiling at a few hundred edges. With polygons as
    row data the native path must handle hundreds of polygons x dozens of
    edges and agree with the NumPy kernel exactly."""
    import numpy as np
    import pandas as pd
    from wikibrain_spark.geo import pip as pip_mod

    rng = np.random.default_rng(7)
    polys = []
    for bid in range(300):  # 300 polygons x 24 edges = 7200 edges
        clat = float(rng.uniform(-60, 60)); clon = float(rng.uniform(-150, 150))
        ang = np.linspace(0, 2 * np.pi, 24, endpoint=False)
        r = 2.0 * (0.7 + 0.6 * rng.random(24))
        polys.append((bid, (clat + r * np.sin(ang)).tolist(), (clon + r * np.cos(ang)).tolist()))
    boundaries = spark.createDataFrame(
        polys, "boundary_id long, ring_lat array<double>, ring_lon array<double>"
    )
    n_pts = 2000
    plat = rng.uniform(-65, 65, n_pts); plon = rng.uniform(-155, 155, n_pts)
    points = spark.createDataFrame(
        pd.DataFrame({"image_id": [str(i) for i in range(n_pts)], "lat": plat, "lon": plon})
    )
    got = {
        (int(r["image_id"]), r["boundary_id"])
        for r in spatial_join.broadcast_pip_join_native(points, boundaries).collect()
    }
    want = set()
    for bid, rlat, rlon in polys:
        inside = pip_mod.points_in_ring(plat, plon, np.asarray(rlat), np.asarray(rlon))
        want |= {(i, bid) for i in np.nonzero(inside)[0]}
    assert got == want


def test_native_pip_cell_prefilter_matches_default(spark):
    """The cell-prefiltered native variant (scale configuration) must return
    exactly the same pairs as the one-row-dim variant."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    polys = []
    for bid in range(40):
        clat = float(rng.uniform(-60, 60)); clon = float(rng.uniform(-150, 150))
        ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        r = 3.0 * (0.7 + 0.6 * rng.random(12))
        polys.append((bid, (clat + r * np.sin(ang)).tolist(), (clon + r * np.cos(ang)).tolist()))
    boundaries = spark.createDataFrame(
        polys, "boundary_id long, ring_lat array<double>, ring_lon array<double>"
    )
    n_pts = 1500
    points = spark.createDataFrame(pd.DataFrame({
        "image_id": [str(i) for i in range(n_pts)],
        "lat": rng.uniform(-65, 65, n_pts), "lon": rng.uniform(-155, 155, n_pts),
    }))
    base = {(r["image_id"], r["boundary_id"])
            for r in spatial_join.broadcast_pip_join_native(points, boundaries).collect()}
    pre = {(r["image_id"], r["boundary_id"])
           for r in spatial_join.broadcast_pip_join_native(
               points, boundaries, cell_prefilter_res=3).collect()}
    assert base and pre == base
