import numpy as np
import duckdb
import pytest
from pyspark.sql import functions as F

from wikibrain_spark.geo import cells

RNG = np.random.default_rng(42)
LATS = RNG.uniform(-89.9, 89.9, 500)
LONS = RNG.uniform(-180.0, 180.0, 500)


@pytest.mark.parametrize("res", [0, 4, 7, 9, 11])
def test_hexlite_numpy_vs_sql(res):
    np_ids = cells.hexlite_cell(LATS, LONS, res)
    sql = cells.hexlite_cell_sql("lat", "lon", res)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lat": LATS, "lon": LONS}))
    sql_ids = con.sql(f"select {sql} as c from pts").df()["c"].to_numpy()
    assert np.array_equal(np_ids, sql_ids)


@pytest.mark.parametrize("res", [7, 9])
def test_hexlite_numpy_vs_spark_column(spark, res):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lat": LATS, "lon": LONS}))
    got = (
        df.select(cells.hexlite_cell_col(F.col("lat"), F.col("lon"), res).alias("c"))
        .toPandas()["c"]
        .to_numpy()
    )
    assert np.array_equal(got, cells.hexlite_cell(LATS, LONS, res))


def test_hexlite_header_bits_and_res_roundtrip():
    ids = cells.hexlite_cell(LATS, LONS, 9)
    res, lat_idx, lon_idx = cells.hexlite_decode(ids)
    assert (res == 9).all()
    assert ((ids >> 60) == 1).all()
    assert (lat_idx >= 0).all() and (lon_idx >= 0).all()


def test_hexlite_center_within_cell():
    ids = cells.hexlite_cell(LATS, LONS, 7)
    clat, clon = cells.hexlite_center(ids)
    again = cells.hexlite_cell(clat, clon, 7)
    assert np.array_equal(ids, again)


def test_hexlite_parent_consistency():
    ids = cells.hexlite_cell(LATS, LONS, 11)
    parents = cells.hexlite_parent(ids, 7)
    res, _, _ = cells.hexlite_decode(parents)
    assert (res == 7).all()


def test_k_ring_size_and_membership():
    cell = int(cells.hexlite_cell(np.array([40.0]), np.array([-74.0]), 9)[0])
    ring = cells.hexlite_k_ring(cell, 1)
    assert len(ring) == 9
    assert cell in ring
    ring2 = cells.hexlite_k_ring(cell, 2)
    assert len(ring2) == 25
    assert set(ring).issubset(set(ring2))


def test_k_ring_wraps_longitude():
    cell = int(cells.hexlite_cell(np.array([0.0]), np.array([179.99]), 7)[0])
    ring = cells.hexlite_k_ring(cell, 1)
    assert len(ring) == 9  # no cells lost at the antimeridian


def test_cover_bbox_contains_point_cells():
    ids = cells.hexlite_cell(LATS[:50], LONS[:50], 6)
    lo_la, hi_la = LATS[:50].min(), LATS[:50].max()
    lo_lo, hi_lo = LONS[:50].min(), LONS[:50].max()
    cover = cells.hexlite_cover_bbox(lo_la, hi_la, lo_lo, hi_lo, 6)
    assert set(ids).issubset(set(cover))


def test_cover_bbox_plus180_seam_emits_j0():
    """An unwrapped bbox ending in [180, n_lon*step-180) stops in the
    grid's over-wide last cell; probe points under its far-east sliver
    (raw lon just above -180) encode to lon_idx 0, so the cover must
    include the j=0 cell (round-5 ADVICE seam fix)."""
    res = 3
    step = cells.hexlite_step(res)
    _, n_lon = cells.hexlite_dims(res)
    assert n_lon * step > 360.0  # non-integral grid: the seam case exists
    # Fiji-style sliver: unwrapped lon range [176, 180.2]
    cover = cells.hexlite_cover_bbox(0.0, 10.0, 176.0, 180.2, res)
    probe = cells.hexlite_cell(np.array([5.0]), np.array([-179.9]), res)
    assert probe[0] in set(cover)
    # and the exactly-180 case from the advice note
    cover180 = cells.hexlite_cover_bbox(0.0, 10.0, 176.0, 180.0, res)
    at_seam = cells.hexlite_cell(np.array([5.0]), np.array([180.0]), res)
    assert at_seam[0] in set(cover180)
    # a bbox safely inside the grid gains no extra cells
    inner = cells.hexlite_cover_bbox(0.0, 10.0, 10.0, 20.0, res)
    assert not any((int(c) & ((1 << 28) - 1)) == 0 for c in inner)


def test_cover_bbox_wrapped_raw_negative_cells_at_odd_res():
    """Round-6 correctness fix: the raw-negative portion of an unwrapped
    dateline bbox must be enumerated through the PROBE formula, not by
    wrapping lon indexes modulo n_lon — at odd resolutions 360/step is
    non-integral (sqrt7 ladder), so index-modular wrap shifts longitude
    by n_lon*step - 360 (2.85 deg at res 1!) and drops probes near the
    bbox's raw-negative edge (caught as a 44-row cross-strategy diff on
    the Meridia fixture once auto cover res landed on 1)."""
    for res in (1, 3, 5):
        step = cells.hexlite_step(res)
        _, n_lon = cells.hexlite_dims(res)
        assert abs(n_lon * step - 360.0) > 1e-9  # the drift case exists
        # Meridia-style ring: raw lon 170 .. -170, unwrapped 170 .. 190
        cover = set(int(c) for c in cells.hexlite_cover_bbox(30.0, 60.0, 170.0, 190.0, res))
        probe_lons = np.arange(-179.9, -170.0, 0.37)  # whole raw-negative extent
        probe_lats = np.full(probe_lons.size, 50.8)
        for pc in cells.hexlite_cell(probe_lats, probe_lons, res):
            assert int(pc) in cover, f"res {res}: probe cell {pc} missing"
        # and the raw-positive side too
        probe_lons = np.arange(170.1, 179.9, 0.37)
        for pc in cells.hexlite_cell(np.full(probe_lons.size, 50.8), probe_lons, res):
            assert int(pc) in cover, f"res {res}: raw-positive probe {pc} missing"


def test_uv_to_st_raises_no_runtime_warning():
    """np.where evaluates both sqrt branches; the fence must keep the
    rejected branch's invalid-sqrt from warning (round-5 verdict #4)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        ids = cells.s2_cell_id(LATS, LONS, 12)
    assert len(ids) == len(LATS)


def test_s2_deterministic_and_hierarchical():
    ids30 = cells.s2_cell_id(LATS, LONS, 30)
    assert np.array_equal(ids30, cells.s2_cell_id(LATS, LONS, 30))
    ids10 = cells.s2_cell_id(LATS, LONS, 10)
    assert np.array_equal(ids10, cells.s2_parent(ids30, 10))
    # face bits sane
    faces = (ids30.astype(np.uint64) >> np.uint64(61)).astype(int)
    assert ((faces >= 0) & (faces <= 5)).all()
    # nearby points share coarse cells; antipodal points do not
    a = cells.s2_cell_id(np.array([40.0]), np.array([-74.0]), 8)[0]
    b = cells.s2_cell_id(np.array([40.0001]), np.array([-74.0001]), 8)[0]
    c = cells.s2_cell_id(np.array([-40.0]), np.array([106.0]), 8)[0]
    assert a == b and a != c


def test_hexlite_parent_rollup():
    """hexlite_parent (round 6): pyramid rollup from cell ids alone.
    Parenthood is center-based approximate containment (the sqrt7 ladder
    is not nested, like real H3): the parent of a point's child cell must
    equal the point's direct parent-res encoding for the vast majority of
    points, never deviate by more than one index per axis (a child
    straddling a parent boundary), and always carry the parent res bits."""
    child = cells.hexlite_cell(LATS, LONS, 7)
    par = cells.hexlite_parent(child, 3)
    direct = cells.hexlite_cell(LATS, LONS, 3)
    assert ((par >> 56) & 0xF == 3).all()
    assert (par == direct).mean() > 0.85
    mask = (1 << 28) - 1
    _, n_lon = cells.hexlite_dims(3)
    di = np.abs(((par >> 28) & mask) - ((direct >> 28) & mask))
    dj = np.abs((par & mask) - (direct & mask))
    dj = np.minimum(dj, n_lon - dj)  # seam-adjacent indexes
    assert di.max() <= 1 and dj.max() <= 1
    # deterministic and res-typed input-independent: idempotent re-encode
    assert np.array_equal(par, cells.hexlite_parent(child, 3))
