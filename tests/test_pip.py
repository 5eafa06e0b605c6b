import numpy as np

from wikibrain_spark.geo import pip

SQUARE_LAT = np.array([0.0, 0.0, 10.0, 10.0])
SQUARE_LON = np.array([0.0, 10.0, 10.0, 0.0])


def test_points_in_ring_square():
    lat = np.array([5.0, 15.0, -1.0, 5.0])
    lon = np.array([5.0, 5.0, 5.0, 15.0])
    got = pip.points_in_ring(lat, lon, SQUARE_LAT, SQUARE_LON)
    assert got.tolist() == [True, False, False, False]


def test_half_open_edge_rule_no_double_count():
    # two squares sharing the lon=10 edge: a point on the shared edge must be
    # in exactly one
    right_lat = SQUARE_LAT
    right_lon = SQUARE_LON + 10.0
    lat = np.array([5.0])
    lon = np.array([10.0])
    in_left = pip.points_in_ring(lat, lon, SQUARE_LAT, SQUARE_LON)
    in_right = pip.points_in_ring(lat, lon, right_lat, right_lon)
    assert int(in_left[0]) + int(in_right[0]) == 1


def test_concave_polygon():
    # C-shape: point in the notch is outside
    ring_lat = np.array([0.0, 0.0, 10.0, 10.0, 8.0, 8.0, 2.0, 2.0])
    ring_lon = np.array([0.0, 10.0, 10.0, 0.0, 0.0, 8.0, 8.0, 0.0])
    lat = np.array([5.0, 1.0, 9.0])
    lon = np.array([4.0, 5.0, 5.0])
    got = pip.points_in_ring(lat, lon, ring_lat, ring_lon)
    assert got.tolist() == [False, True, True]


def test_polygon_index_matches_bruteforce():
    rng = np.random.default_rng(7)
    polys = []
    for i in range(30):
        clat, clon = rng.uniform(-60, 60), rng.uniform(-170, 170)
        r = rng.uniform(0.5, 4.0)
        ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        polys.append((i, clat + r * np.sin(ang), clon + r * np.cos(ang)))
    idx = pip.PolygonIndex([p[0] for p in polys], [p[1] for p in polys], [p[2] for p in polys], res=3)
    lat = rng.uniform(-65, 65, 2000)
    lon = rng.uniform(-175, 175, 2000)
    got_pt, got_poly = idx.query_batch(lat, lon)
    got = set(zip(got_pt.tolist(), got_poly.tolist()))
    want = set()
    for pid, rlat, rlon in polys:
        inside = pip.points_in_ring(lat, lon, rlat, rlon)
        for j in np.nonzero(inside)[0]:
            want.add((int(j), pid))
    assert got == want
