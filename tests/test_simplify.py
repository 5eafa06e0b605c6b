"""Douglas-Peucker simplification pins (round 7): the Hausdorff
guarantee is checked by brute force (every ORIGINAL vertex within
tolerance of the simplified chain), plus frame handling (dateline rings
simplify unwrapped and map back), determinism, ring well-formedness,
the Spark operator's parity with the NumPy kernel, and the reduction
factor + area stability that make the operator worth running as a
snapshot prepass."""

import numpy as np
import pandas as pd
import pytest

from wikibrain_spark.geo import pip, simplify
from wikibrain_spark.operators import spatial_join
from wikibrain_spark.sources import synthetic

TOL = 0.05


def _min_seg_dist2(py: np.ndarray, px: np.ndarray,
                   sy: np.ndarray, sx: np.ndarray) -> np.ndarray:
    """min over the CLOSED simplified chain's segments of squared
    point-segment distance, for every probe vertex (vectorized probe x
    segment)."""
    y0, x0 = sy, sx
    y1, x1 = np.roll(sy, -1), np.roll(sx, -1)
    dy, dx = y1 - y0, x1 - x0
    l2 = dy * dy + dx * dx
    my = py[:, None] - y0[None, :]
    mx = px[:, None] - x0[None, :]
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.clip(np.where(l2 > 0, (my * dy + mx * dx) / l2, 0.0), 0.0, 1.0)
    d2 = (my - t * dy) ** 2 + (mx - t * dx) ** 2
    return d2.min(axis=1)


def _rings_of(df: pd.DataFrame) -> list:
    return [rr for _, r in df.iterrows() for rr in r["rings"]]


def test_dp_hausdorff_guarantee_all_coastline_rings():
    for rr in _rings_of(synthetic.generate_coastlines()):
        la = np.asarray(rr["ring_lat"], dtype=np.float64)
        lo = np.asarray(rr["ring_lon"], dtype=np.float64)
        wraps = pip.ring_wraps(lo)
        xs = pip.unwrap_lon(lo) if wraps else lo
        sy, sx = simplify.dp_simplify_ring(la, xs, TOL)
        assert 3 <= sy.size < la.size
        worst = float(np.sqrt(_min_seg_dist2(la, xs, sy, sx).max()))
        assert worst <= TOL + 1e-12, f"Hausdorff bound violated: {worst}"


def test_dp_kept_vertices_are_subset_in_order_and_deterministic():
    rr = _rings_of(synthetic.generate_coastlines())[0]
    la = np.asarray(rr["ring_lat"]); lo = np.asarray(rr["ring_lon"])
    sy, sx = simplify.dp_simplify_ring(la, lo, TOL)
    sy2, sx2 = simplify.dp_simplify_ring(la, lo, TOL)
    np.testing.assert_array_equal(sy, sy2)
    np.testing.assert_array_equal(sx, sx2)
    # subset in original order: consume la in order matching sy
    j = 0
    for v in sy:
        while j < la.size and la[j] != v:
            j += 1
        assert j < la.size, "kept vertex not found in original order"
        j += 1


def test_dp_wrapped_ring_stays_wrapped_and_in_range():
    mega = synthetic.generate_coastlines()
    shelf = mega[mega["boundary_id"] == 31].iloc[0]["rings"][0]
    out = simplify.simplify_rings_pd([shelf], TOL)[0]
    lo = np.asarray(out["ring_lon"])
    assert (lo >= -180.0).all() and (lo < 180.0).all()
    assert pip.ring_wraps(lo), "simplified dateline ring must still wrap"
    # guarantee holds in the unwrapped test frame
    la0 = np.asarray(shelf["ring_lat"], dtype=np.float64)
    x0 = pip.unwrap_lon(np.asarray(shelf["ring_lon"], dtype=np.float64))
    x1 = pip.unwrap_lon(lo)
    worst = float(np.sqrt(_min_seg_dist2(
        la0, x0, np.asarray(out["ring_lat"]), x1).max()))
    assert worst <= TOL + 1e-12


def test_dp_megacoast_reduction_and_guarantee_sampled():
    """600k-vertex snapshot: the prepass the operator exists for. The
    continent ring must shrink >20x at 0.02 deg; the Hausdorff check
    runs on a seeded 20k-vertex sample (full brute is 2e9 pairs)."""
    mega = synthetic.generate_megacoast()
    outer = mega.iloc[0]["rings"][0]
    la = np.asarray(outer["ring_lat"], dtype=np.float64)
    lo = np.asarray(outer["ring_lon"], dtype=np.float64)
    sy, sx = simplify.dp_simplify_ring(la, lo, 0.02)
    assert sy.size < la.size / 20, f"only reduced to {sy.size} of {la.size}"
    sel = np.random.default_rng(5).choice(la.size, 20_000, replace=False)
    worst = float(np.sqrt(_min_seg_dist2(la[sel], lo[sel], sy, sx).max()))
    assert worst <= 0.02 + 1e-12
    # area stability: boundary moves <= tol, so area drift is O(P * tol)
    def shoelace(y, x):
        return 0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))
    a0, a1 = shoelace(la, lo), shoelace(sy, sx)
    assert abs(a1 - a0) / a0 < 0.01


def test_simplify_rings_spark_operator_matches_kernel(spark):
    coast = synthetic.generate_coastlines()
    bdf = spark.createDataFrame(
        [(int(r["boundary_id"]),
          [(rr["ring_lat"], rr["ring_lon"], rr["is_hole"]) for rr in r["rings"]])
         for _, r in coast.iterrows()],
        f"boundary_id long, rings {spatial_join.RINGS_TYPE}",
    )
    got = {r["boundary_id"]: r["rings"]
           for r in spatial_join.simplify_rings(bdf, TOL).collect()}
    for _, row in coast.iterrows():
        want = simplify.simplify_rings_pd(row["rings"], TOL)
        have = got[row["boundary_id"]]
        assert len(have) == len(want)
        for hr, wr in zip(have, want):
            np.testing.assert_array_equal(np.asarray(hr["ring_lat"]),
                                          np.asarray(wr["ring_lat"]))
            np.testing.assert_array_equal(np.asarray(hr["ring_lon"]),
                                          np.asarray(wr["ring_lon"]))
            assert hr["is_hole"] == wr["is_hole"]


def test_compactness_analytic_circleoid(spark):
    """polygon_compactness: a fine regular polygon approximating a small
    circle must score polsby_popper ~ 1 (planar limit; 1 deg radius at
    the equator keeps spherical distortion ~1e-4), and a 40:1 filament
    must score far lower — the ordering the QA filter relies on."""
    th = np.linspace(0, 2 * np.pi, 720, endpoint=False)
    circ_lat = (1.0 * np.sin(th)).tolist()
    circ_lon = (1.0 * np.cos(th)).tolist()
    fil = ([0.0, 0.0, 0.1, 0.1], [0.0, 4.0, 4.0, 0.0])
    bdf = spark.createDataFrame(
        [(1, [(circ_lat, circ_lon, False)]),
         (2, [(list(map(float, fil[0])), list(map(float, fil[1])), False)])],
        f"boundary_id long, rings {spatial_join.RINGS_TYPE}",
    )
    out = {r["boundary_id"]: r for r in spatial_join.polygon_compactness(bdf).collect()}
    assert out[1]["polsby_popper"] == pytest.approx(1.0, abs=2e-3)
    assert out[2]["polsby_popper"] < 0.2
    assert out[1]["area_km2"] > 0 and out[1]["perimeter_km"] > 0
