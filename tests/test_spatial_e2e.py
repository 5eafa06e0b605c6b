"""End-to-end: images parquet -> geotag UDF -> PIP join -> tile assignments,
checked row-for-row against the pure-Python oracle (FIXTURES.md §6)."""

import numpy as np
import pandas as pd
import pytest

from wikibrain_spark.operators import geotag, spatial_join
from wikibrain_spark.sources import synthetic

N_IMAGES = 400


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    return synthetic.materialize(str(tmp_path_factory.mktemp("wbs")), N_IMAGES)


@pytest.fixture(scope="module")
def images(spark, paths):
    return spark.read.parquet(paths["images"])


@pytest.fixture(scope="module")
def boundaries(spark, paths):
    return spark.read.parquet(paths["boundaries"])


def test_geotag_matches_embedded_truth(spark, paths, images):
    got = geotag.extract_geotags(images).toPandas().sort_values("image_id").reset_index(drop=True)
    want = pd.read_parquet(paths["expected_geotags"]).sort_values("image_id").reset_index(drop=True)
    assert len(got) == N_IMAGES
    assert got["image_id"].tolist() == want["image_id"].tolist()
    np.testing.assert_allclose(got["lat"], want["lat"], rtol=0, atol=0)  # exact
    np.testing.assert_allclose(got["lon"], want["lon"], rtol=0, atol=0)
    # cells consistent with the NumPy kernel
    from wikibrain_spark.geo import cells

    for r in (7, 9, 11):
        np.testing.assert_array_equal(
            got[f"cell_r{r}"].to_numpy(),
            cells.hexlite_cell(want["lat"].to_numpy(), want["lon"].to_numpy(), r),
        )
    assert got["s2_cell"].nunique() > 1


def _tiles_df(df):
    return (
        df.toPandas()[["image_id", "cell_r9", "boundary_id", "qid"]]
        .sort_values(["image_id", "boundary_id"])
        .reset_index(drop=True)
    )


def test_broadcast_tiles_match_oracle(spark, paths, images, boundaries):
    pts = geotag.extract_geotags(images, with_s2=False)
    got = _tiles_df(spatial_join.tile_assignments(pts, boundaries, strategy="broadcast"))
    want = pd.read_parquet(paths["expected_tiles"])
    pd.testing.assert_frame_equal(got, want.astype({"cell_r9": "int64"}), check_dtype=False)
    assert len(got) > 0


def test_shuffle_join_matches_broadcast(spark, paths, images, boundaries):
    pts = geotag.extract_geotags(images, with_s2=False)
    b = spatial_join.broadcast_pip_join(pts, boundaries).select("image_id", "boundary_id")
    s = spatial_join.shuffle_pip_join(pts, boundaries).select("image_id", "boundary_id")
    bp = b.toPandas().sort_values(["image_id", "boundary_id"]).reset_index(drop=True)
    sp = s.toPandas().sort_values(["image_id", "boundary_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(bp, sp)


def test_shuffle_join_salting_path(spark, paths, images, boundaries):
    # force every cell hot so the salted path actually executes
    pts = geotag.extract_geotags(images, with_s2=False)
    s = spatial_join.shuffle_pip_join(pts, boundaries, hot_cell_threshold=0, n_salt=4)
    b = spatial_join.broadcast_pip_join(pts, boundaries)
    assert sorted(map(tuple, s.select("image_id", "boundary_id").collect())) == sorted(
        map(tuple, b.select("image_id", "boundary_id").collect())
    )


def test_decode_stats_invariants(spark, images):
    stats = geotag.decode_stats(images).toPandas()
    assert len(stats) == N_IMAGES
    lossy = stats[stats["fmt"] == "dctq"]
    assert (lossy["psnr_db"] >= 40.0).all()  # BASELINE.json per-row invariant
    lossless = stats[stats["fmt"] != "dctq"]
    assert np.isinf(lossless["psnr_db"]).all()


def test_phash_recomputation_matches_for_lossless(spark, images):
    stats = geotag.decode_stats(images).toPandas().set_index("image_id")
    orig = images.select("image_id", "fmt", "phash").toPandas().set_index("image_id")
    joined = orig.join(stats[["phash_check"]])
    lossless = joined[joined["fmt"] != "dctq"]
    assert (lossless["phash"] == lossless["phash_check"]).all()


def test_image_features_shape(spark, images):
    feats = geotag.image_features(images.limit(20)).toPandas()
    assert len(feats) == 20
    assert all(len(f) == 8 * 8 * 3 for f in feats["feature"])
